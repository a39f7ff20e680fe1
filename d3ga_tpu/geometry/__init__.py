from d3ga_tpu.geometry.tet import (  # noqa: F401
    tet_gradient,
    tet_volume,
    fem_energy,
    deformation_gradient,
    barycentric_blend,
    tet_faces,
)
from d3ga_tpu.geometry.embed import embed_points_in_tets, point_tet_barycentric  # noqa: F401
