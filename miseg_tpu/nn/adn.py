"""ADN: optional Activation / Dropout / Norm in a configurable order.

Reference parity: `ADN` (networks/blocks/acti_norm.py:20-109) — ordering
string (default "NDA"), norm receives `modalities` when conditional.
Channel-last; rank-agnostic (the reference's `norm_dim`/`dropout_dim`
spatial-rank plumbing is unnecessary here).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from .factories import get_act
from .norms import make_norm


class ADN(nn.Module):
    channels: int
    ordering: str = "NDA"
    act: str | tuple[str, dict[str, Any]] | None = "relu"
    norm: tuple[str, dict[str, Any]] | str | None = None
    dropout: float | None = None

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        for item in self.ordering.upper():
            if item == "A" and self.act is not None:
                x = get_act(self.act, module_name="A")(x)
            elif item == "D" and self.dropout:
                x = nn.Dropout(rate=float(self.dropout), name="D")(x, deterministic=not train)
            elif item == "N" and self.norm is not None:
                x = make_norm(self.norm, self.channels, name="N")(x, modalities, train=train)
            elif item not in "ADN":
                raise ValueError(f"ordering must only contain A, D, N; got {item!r}")
        return x
