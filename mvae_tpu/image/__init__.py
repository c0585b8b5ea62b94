from mvae_tpu.image.transforms import (
    rgb_to_grayscale,
    canny_edges,
    obscure,
    alpha_composite,
    make_watermark,
    load_watermark,
    landmark_mask,
)
