from .norms import Norm, make_norm  # noqa: F401
from .factories import get_act, get_norm_spec, PReLU  # noqa: F401
from .adn import ADN  # noqa: F401
from .convolutions import Convolution, ResidualUnit  # noqa: F401
from .dynunet import UnetBasicBlock, UnetOutBlock, UnetResBlock, UnetUpBlock  # noqa: F401
from .unetr_blocks import UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock  # noqa: F401
from .transformer import MLPBlock, SABlock, TransformerBlock  # noqa: F401
from .swin import (DropPath, PatchEmbed, PatchMerging, PatchMergingV2,  # noqa: F401
                   SwinTransformerBlock, WindowAttention)
from .patch_embedding import PatchEmbeddingBlock  # noqa: F401
from .layers import GradientReversal, SkipConnection, gradient_reversal  # noqa: F401
