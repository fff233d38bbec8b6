from .media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    decode_audio_features,
    decode_image_features,
    sample_video_frames,
    video_near_duplicates,
    wav_mono_samples,
    with_media_meta,
)
from .afp import (  # noqa: F401
    audio_fingerprint,
    audio_fingerprint64,
    audio_near_duplicates,
)
from .phash import dhash64, image_dhash, image_near_duplicates  # noqa: F401
from .y4m import Y4mError, Y4mInfo, parse_header as parse_y4m_header  # noqa: F401
