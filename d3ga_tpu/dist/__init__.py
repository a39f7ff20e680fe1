from d3ga_tpu.dist.mesh import make_mesh, local_mesh  # noqa: F401
from d3ga_tpu.dist.raster_shard import rasterize_sharded  # noqa: F401
