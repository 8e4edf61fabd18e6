from .media import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
    media_metadata,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image_features",
    "frame_sample_plan",
    "media_metadata",
    "resize_images",
]
