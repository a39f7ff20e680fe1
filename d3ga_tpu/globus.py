"""Test-time constants (`/root/reference/globus.py`)."""

DEFAULT_FPS = 30
DEFAULT_CRF = 20
MAX_N_FRAMES = 1500
CAM_TEST = "cam_test"
CAM_360 = "cam_360"
# Goliath default held-out camera (`configs/goliath_axe184.yml:21`).
DEFAULT_TEST_CAMERA = "402699"
