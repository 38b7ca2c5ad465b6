from .video_reader import (read_video_frames, sample_frames_with_fps,
                           video_info, write_video)
from .dataset import VidTokDataset, VidTokValDataset
from .datamodule import DataModuleFromConfig

__all__ = [
    "read_video_frames",
    "sample_frames_with_fps",
    "video_info",
    "write_video",
    "VidTokDataset",
    "VidTokValDataset",
    "DataModuleFromConfig",
]
