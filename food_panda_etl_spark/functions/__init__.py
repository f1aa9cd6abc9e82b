"""Column-function extensions beyond pyspark.sql.functions.

``multimodal`` — opaque binary media columns (image/audio/video) with
typed metadata and Arrow-batched decode/transform plumbing.
"""

from food_panda_etl_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    attach_payload_meta,
    decode_images,
    embed_media,
    sample_frames,
    synth_image_payload,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_payload_meta",
    "decode_images",
    "embed_media",
    "sample_frames",
    "synth_image_payload",
]
