"""Multimodal column support (SURVEY.md §7): opaque binary payloads +
typed metadata, with Arrow-batched decode/feature/resize stubs."""

from comix_etl_spark.multimodal.media import (  # noqa: F401
    attach_binary_metadata,
    decode_image_features,
    frame_sample_plan,
    read_binary_files,
)
