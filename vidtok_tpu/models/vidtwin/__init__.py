from .st_transformer import STTEncoder, STTDecoder
from .qformer import QFormerInterface
from .vidtwin_ae import VidTwinVAE, build_vidtwin_from_config
from .ablations import VidTwinQformer, VidTwinCompact, VidTwinSym

__all__ = ["STTEncoder", "STTDecoder", "QFormerInterface", "VidTwinVAE",
           "VidTwinQformer", "VidTwinCompact", "VidTwinSym",
           "build_vidtwin_from_config"]
