"""Container I/O: feeding real-world streams into the decoder."""

from .flv import FlvVideoTag, iter_flv_video_tags

__all__ = ["FlvVideoTag", "iter_flv_video_tags"]
