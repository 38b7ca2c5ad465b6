from .st_transformer import STTEncoder, STTDecoder
from .qformer import QFormerInterface
from .vidtwin_ae import VidTwinVAE, build_vidtwin_from_config

__all__ = ["STTEncoder", "STTDecoder", "QFormerInterface", "VidTwinVAE",
           "build_vidtwin_from_config"]
