"""Pallas TPU kernel rungs of the renderer ladder (rungs 2-4).

Mirrors the reference's CUDA optimization ladder (GPURenderer1 -> 23 -> 4,
reference: Renderer.h:30-80) re-designed around TPU hardware realities:

  * There is no per-lane arbitrary gather on the VPU. The only vectorized
    dynamic gather Mosaic supports is the same-shape lane gather
    ``take_along_axis(src, idx, axis=-1)``. Volume sampling is therefore
    decomposed as a (z, y)-row **one-hot matmul on the MXU** (which doubles as
    the z/y trilinear interpolation when the one-hot carries lerp weights)
    followed by an x **lane gather** on the VPU.
  * Per-thread ``break`` (ERT) / variable leap loops (ESL) become masked
    lockstep marching with a tile-level early exit (``while_loop`` over steps
    whose condition is ``any(alive)``), and a leading-leap offset computed
    outside the kernel.
  * CUDA constant memory becomes SMEM scalars; CUDA 3D textures become a
    VMEM-resident ``(Z, Y, X)`` array (rung 3) or HBM + per-step DMA-staged
    window bricks (rung 4).
"""
