from .autoencoder import TokenizerCore, VideoTokenizer, build_core_from_config

__all__ = ["TokenizerCore", "VideoTokenizer", "build_core_from_config"]
