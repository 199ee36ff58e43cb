from .deflow import DeFlow, build_model
from .embedder import DynamicEmbedder, MaskedBatchNorm, PillarFeatureNet
from .unet import ConvWithNorms, FastFlow3DUNet, UpsampleSkip
from .decoder import ConvGRU, ConvGRUDecoder, LinearDecoder, MMHeadDecoder
