"""DNN subgrid-stress closure network.

The reference fork runs a TorchScript-exported E(2)-equivariant CNN
(``analysis/util.py`` class CNDNN: R2Conv(k=3, valid) -> ReLU -> 4x
R2Conv(k=1) -> change-of-basis Linear(6,6)) through libtorch inside the C++
diffusion class (``src/diff_dnn_local.cxx:891-894``).

TPU-first re-design: because the input patch is 3x3 and the first conv is
'valid' with kernel 3, the whole network is mathematically an MLP on the
12*3*3 = 108-dim flattened patch.  We therefore run it as a bf16/f32 batched
matmul chain on the MXU over every grid point at once — no im2col conv, no
host/device boundary.  Weights can come from:

* an .npz file with arrays ``w0..wN`` (expanded (C_out, C_in) mats, the
  first including the 3x3 spatial taps: (C1, 108)) and ``change_basis``;
* a TorchScript .pt (via CPU torch) — expanded ``filter`` buffers are pulled
  from the scripted R2Conv modules when present;
* seeded random initialization (for testing / cases without vendored
  weights — the reference repo ships none).
"""

import os

import numpy as np
import jax.numpy as jnp

# Change of basis P^-1 mapping network outputs to stress components
# [T11, T12, T13, T22, T23, T33] (analysis/util.py CNDNN.Pinv).
PINV = np.array([
    [0.5, 0., 0., 0., -0.25, 0.25],
    [0., 0., 0., 0., 0.25, 0.25],
    [0., 0., 1., 0., 0., 0.],
    [0.5, 0., 0., 0., 0.25, -0.25],
    [0., 0., 0., 1., 0., 0.],
    [0., 1., 0., 0., 0., 0.]])

N_IN = 12 * 3 * 3


class TauDNN:
    """Weights: list of (C_out, C_in) float arrays; forward = relu-matmul
    chain + final change-of-basis (no biases, like the reference nets)."""

    def __init__(self, weights, change_basis=None, dtype=np.float32):
        self.weights = [jnp.asarray(w, dtype=dtype) for w in weights]
        cb = PINV if change_basis is None else change_basis
        self.change_basis = jnp.asarray(cb, dtype=dtype)
        if self.weights[0].shape[1] != N_IN:
            raise ValueError("first layer must map from %d inputs" % N_IN)
        if self.weights[-1].shape[0] != 6:
            raise ValueError("last layer must produce 6 outputs")

    def __call__(self, x):
        """x: (..., 108) -> Tau (..., 6)."""
        h = x
        for w in self.weights[:-1]:
            h = jnp.maximum(h @ w.T, 0.)
        h = h @ self.weights[-1].T
        return h @ self.change_basis.T

    # -- constructors -------------------------------------------------------
    @classmethod
    def random(cls, hidden=(64, 64, 64, 64), seed=0, dtype=np.float32):
        rng = np.random.RandomState(seed)
        dims = [N_IN] + list(hidden) + [6]
        ws = []
        for i in range(len(dims) - 1):
            scale = np.sqrt(2. / dims[i])
            ws.append(rng.randn(dims[i + 1], dims[i]) * scale * 0.1)
        return cls(ws, dtype=dtype)

    @classmethod
    def from_npz(cls, path, dtype=np.float32):
        data = np.load(path)
        ws = []
        i = 0
        while "w%d" % i in data:
            ws.append(data["w%d" % i])
            i += 1
        cb = data["change_basis"] if "change_basis" in data else None
        return cls(ws, cb, dtype=dtype)

    @classmethod
    def from_torchscript(cls, path, dtype=np.float32):
        """Extract expanded conv filters from a TorchScript CNDNN export.

        The e2cnn export registers the expanded kernels as ``filter``
        buffers (reference ``analysis/util.py``); a plain ``torch.nn``
        export carries them as ``Conv2d.weight`` parameters.  Both are
        (C_out, C_in, kh, kw) and flatten to the same (C_out, C_in*kh*kw)
        matmul the MXU chain runs."""
        import torch
        mod = torch.jit.load(path, map_location="cpu")
        mod.eval()
        ws = []
        cb = None
        tensors = list(mod.named_buffers()) + list(mod.named_parameters())
        filt = [(n, b) for n, b in tensors if n.endswith("filter")]
        if not filt:
            filt = [(n, b) for n, b in tensors
                    if n.endswith("weight") and b.dim() == 4]
        for name, buf in filt:
            arr = buf.detach().cpu().numpy()
            ws.append(arr.reshape(arr.shape[0], -1))
        for name, buf in tensors:
            arr = buf.detach().cpu().numpy()
            if "change_basis" in name and arr.shape == (6, 6):
                cb = arr
        if not ws:
            raise ValueError("no conv filters found in %s "
                             "(export the e2cnn model in eval() mode)" % path)
        return cls(ws, cb, dtype=dtype)

    @classmethod
    def load(cls, path, dtype=np.float32, allow_random=False):
        """Load closure weights.  A missing/empty path is an ERROR unless
        the caller explicitly opts into seeded random weights (testing) —
        silently running random physics in production is never OK."""
        if path and os.path.exists(path):
            if path.endswith(".npz"):
                return cls.from_npz(path, dtype)
            return cls.from_torchscript(path, dtype)
        if not allow_random:
            raise ValueError(
                "[diff] dnnpath %r does not exist; swdiff=dnn_* needs trained "
                "weights (.npz or TorchScript .pt).  Set [diff] swdnnrandom=1 "
                "to run with seeded random weights (testing only)."
                % (path,))
        import warnings
        warnings.warn("diff_dnn: running with RANDOM closure weights "
                      "(swdnnrandom=1) — testing only")
        return cls.random(dtype=dtype)
