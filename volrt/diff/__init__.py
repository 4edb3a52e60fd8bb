"""Differentiable rendering: the capability the reference lacks entirely.

The raycasting forward pass re-expressed as a ``lax.scan`` over march steps so
reverse-mode autodiff produces exact gradients of rendered pixels w.r.t. the
voxel density grid and the transfer-function LUT. This is the foundation for
``volrt fit`` (inverse rendering / volume+TF optimization) and the
multi-host training configuration of BASELINE.md.
"""
from volrt.diff.render import DiffScene, render_diff, render_diff_image  # noqa: F401
