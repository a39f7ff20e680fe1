from d3ga_tpu.raster.camera import Camera, make_camera  # noqa: F401
from d3ga_tpu.raster.api import RasterSettings, rasterize, render  # noqa: F401
