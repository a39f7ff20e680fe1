from d3ga_tpu.fields.mlp import (  # noqa: F401
    init_mlp,
    apply_mlp,
    init_deformation_field,
    deformation_field,
    init_canonical_field,
    canonical_field,
    init_color_field,
    color_field,
    init_face_decoder,
    face_decoder,
    init_shadow_decoder,
    shadow_decoder,
)
from d3ga_tpu.fields.embeddings import init_embedding, embedding_lookup, embedding_average  # noqa: F401
from d3ga_tpu.fields.calibration import init_camera_calibration, apply_camera_calibration  # noqa: F401
from d3ga_tpu.fields.blur import init_learnable_blur, apply_learnable_blur, blur_reg  # noqa: F401
from d3ga_tpu.fields.pixel_bias import init_pixel_bias, apply_pixel_bias  # noqa: F401
from d3ga_tpu.fields.background import (  # noqa: F401
    init_background_model,
    apply_background,
    composite_background,
    blurred_noise,
)
