from .media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    decode_audio_features,
    decode_image_features,
    sample_video_frames,
    with_media_meta,
)
