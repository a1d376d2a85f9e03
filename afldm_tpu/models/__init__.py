from .layers import (
    ResnetBlock2D, Attention, Downsample2D, Upsample2D,
    TimestepEmbedding, get_timestep_embedding, WrappedActivation, KVHelper,
)
from .unet2d import UNet2DModel, UNet2DConfig, UNetMidBlock2D
from .unet2d_condition import UNet2DConditionModel, UNet2DConditionConfig
from .controlnet import ControlNetModel, ControlNetConfig
from .attention_blocks import (CrossAttention, BasicTransformerBlock,
                               Transformer2DModel, FeedForward)
from .vq import VQModel, VQModelConfig
from .vae import (AutoencoderKL, AutoencoderKLConfig, Encoder, Decoder,
                  gaussian_sample, gaussian_kl)
from .discriminator import Discriminator, hinge_d_loss, hinge_g_loss

__all__ = [
    "ResnetBlock2D", "Attention", "Downsample2D", "Upsample2D",
    "TimestepEmbedding", "get_timestep_embedding", "WrappedActivation",
    "KVHelper",
    "UNet2DModel", "UNet2DConfig", "UNetMidBlock2D",
    "UNet2DConditionModel", "UNet2DConditionConfig",
    "ControlNetModel", "ControlNetConfig",
    "CrossAttention", "BasicTransformerBlock", "Transformer2DModel",
    "FeedForward",
    "AutoencoderKL", "AutoencoderKLConfig", "Encoder", "Decoder",
    "VQModel", "VQModelConfig",
    "gaussian_sample", "gaussian_kl",
    "Discriminator", "hinge_d_loss", "hinge_g_loss",
]
