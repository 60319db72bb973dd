"""Interop with the upstream torch/MONAI reference stack.

`monai_stub.install_monai_stub()` registers just enough of the `monai`
package surface (utils + a handful of torch layers) for the reference
repo's networks to import and run on plain torch — used by the golden
full-model parity tests and the same-host CPU baseline benchmark.
"""

from .monai_stub import install_monai_stub  # noqa: F401
