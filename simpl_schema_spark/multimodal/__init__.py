from .media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    decode_audio_features,
    decode_image_features,
    sample_video_frames,
    with_media_meta,
)
from .phash import dhash64, image_dhash, image_near_duplicates  # noqa: F401
from .y4m import Y4mError, Y4mInfo, parse_header as parse_y4m_header  # noqa: F401
