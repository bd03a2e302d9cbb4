from p6__mapreduce_spark.multimodal.columns import (
    attach_binary_payload,
    decode_image,
    extract_features,
    frame_sample,
)

__all__ = ["attach_binary_payload", "decode_image", "extract_features", "frame_sample"]
