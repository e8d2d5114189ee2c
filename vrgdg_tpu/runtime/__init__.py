"""Host runtime: media IO, frame streaming, device feeding."""

from .video_io import (CODEC_CANDIDATES, IMAGE_EXTENSIONS, VIDEO_EXTENSIONS,
                       PrefetchingReader, VideoReader, VideoWriter,
                       array_to_frames, concat_videos, find_ffmpeg,
                       frames_to_array, media_has_audio, normalize_video_path,
                       probe_video, safe_name, validate_video_readable,
                       write_video_with_fallback)

__all__ = [
    "CODEC_CANDIDATES", "IMAGE_EXTENSIONS", "VIDEO_EXTENSIONS",
    "PrefetchingReader", "VideoReader", "VideoWriter", "array_to_frames",
    "concat_videos", "find_ffmpeg", "frames_to_array", "media_has_audio",
    "normalize_video_path", "probe_video", "safe_name",
    "validate_video_readable", "write_video_with_fallback",
]
