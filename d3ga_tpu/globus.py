"""Test-time constants (`/root/reference/globus.py`)."""

DEFAULT_FPS = 30
CAM_TEST = "402699"
CAM_360 = "401031"
MAX_N_FRAMES = 1500
