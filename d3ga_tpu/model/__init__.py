from d3ga_tpu.model.cage_model import (  # noqa: F401
    CageGeometry,
    init_cage_params,
    cage_forward,
)
from d3ga_tpu.model.avatar import AvatarModel, init_avatar, avatar_forward  # noqa: F401
