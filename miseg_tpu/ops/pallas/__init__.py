from .cond_instance_norm import fused_conditional_instance_norm  # noqa: F401
from .fused_norm import fused_instance_norm_act  # noqa: F401
from .window_attention import fused_window_attention  # noqa: F401
