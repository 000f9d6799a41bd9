"""Make the reference implementation importable on a torch-CPU host.

The reference (/root/reference, override with CMR_REFERENCE_ROOT) depends
on the ``torch_scatter`` CUDA extension and calls ``.cuda()`` inside
``forward`` (IMGPCEncoder.py:130-134, MultiHeadModel.py:68,78,244,251,346).
This module shims both so the reference's own model/environment code runs
unmodified on CPU — used by the full-graph parity tests and the
real-artifact parity kit (:mod:`cmr_agent_tpu.tools.parity_eval`).
"""

from __future__ import annotations

import os
import sys
import types

import torch

DEFAULT_REFERENCE_ROOT = "/root/reference"


def reference_root() -> str:
    return os.environ.get("CMR_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)


def install_reference_imports(root: str | None = None) -> str:
    """Install the torch_scatter shim + .cuda() no-ops and put the
    reference root on ``sys.path``. Returns the root used. Idempotent."""
    if "torch_scatter" not in sys.modules:
        shim = types.ModuleType("torch_scatter")

        def _sized(src, index, dim, dim_size, fill):
            if dim_size is not None:
                n = dim_size
            else:
                n = int(index.max().item()) + 1 if index.numel() else 0
            shape = list(src.shape)
            shape[dim] = n
            return torch.full(shape, fill, dtype=src.dtype)

        def scatter_max(src, index, dim=0, dim_size=None):
            out = _sized(src, index, dim, dim_size, -float("inf"))
            out = out.scatter_reduce(dim, index, src, reduce="amax",
                                     include_self=True)
            return out, torch.zeros_like(out, dtype=torch.long)

        def scatter_sum(src, index, dim=0, dim_size=None):
            out = _sized(src, index, dim, dim_size, 0.0)
            return out.scatter_add(dim, index, src)

        def scatter_mean(src, index, dim=0, dim_size=None):
            s = scatter_sum(src, index, dim, dim_size)
            c = scatter_sum(torch.ones_like(src), index, dim, dim_size)
            return s / c.clamp(min=1.0)

        shim.scatter_max = scatter_max
        shim.scatter_sum = scatter_sum
        shim.scatter_mean = scatter_mean
        sys.modules["torch_scatter"] = shim

    # open3d / cv2 are imported at module level by the reference's
    # environment/dataset but only exercised on debug-visualisation paths
    # (environment.py:9, dataset/KittiDataset.py) — stub them so imports
    # succeed; touching a stub attribute raises loudly.
    for name in ("open3d", "cv2"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.__getattr__ = lambda attr, _n=name: (_ for _ in ()).throw(
                    RuntimeError(f"reference shim: {_n}.{attr} called but "
                                 f"{_n} is not installed on this host"))
                sys.modules[name] = stub

    root = root or reference_root()
    if root not in sys.path:
        sys.path.insert(0, root)

    # no CUDA on this host; keep everything on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    return root
