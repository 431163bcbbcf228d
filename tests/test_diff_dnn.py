"""DNN subgrid-closure: network equivalence vs torch convs + SBL smoke run."""

import numpy as np
import pytest

from microhh_tpu.config import Ini
from microhh_tpu.model import Model
from microhh_tpu.models.dnn import TauDNN, PINV


def test_taudnn_matches_torch_conv():
    """The MXU matmul chain must reproduce a torch Conv2d(3x3 valid) +
    1x1-conv network on 3x3 patches — validating the MLP-collapse and the
    channel/spatial flattening order used for weight import."""
    import torch

    rng = np.random.RandomState(0)
    c1, c2 = 16, 12
    w0 = rng.randn(c1, 12, 3, 3).astype(np.float32) * 0.2
    w1 = rng.randn(c2, c1, 1, 1).astype(np.float32) * 0.2
    w2 = rng.randn(6, c2, 1, 1).astype(np.float32) * 0.2

    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(12, c1, 3, bias=False),
        torch.nn.ReLU(),
        torch.nn.Conv2d(c1, c2, 1, bias=False),
        torch.nn.ReLU(),
        torch.nn.Conv2d(c2, 6, 1, bias=False),
    )
    with torch.no_grad():
        tmodel[0].weight.copy_(torch.from_numpy(w0))
        tmodel[2].weight.copy_(torch.from_numpy(w1))
        tmodel[4].weight.copy_(torch.from_numpy(w2))

    x = rng.randn(32, 12, 3, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).squeeze(-1).squeeze(-1).numpy()
    ref = ref @ PINV.T

    net = TauDNN([w0.reshape(c1, -1), w1.reshape(c2, c1), w2.reshape(6, c2)])
    out = np.asarray(net(x.reshape(32, -1)))
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()


SBL_INI = """
[grid]
itot=16
jtot=16
ktot=32
xsize=27.386127875258303
ysize=27.386127875258303
zsize=18.074844397670482
swspatialorder=2

[diff]
swdiff=%(swdiff)s
swdnnrandom=1
dnmax=0.3
tPr=10.0
Re=900.
Ug=0.05
b0=-0.0044
uvStd=0.01
wStd=0.005
bStd=0.001
ThStd=1e-5
Ti3Std=1e-5
T33Std=1e-5

[thermo]
swthermo=buoy

[force]
swlspres=geo
fc=0.0001

[fields]
visc=0.000015
svisc=0.000015
rndz=18.
rndamp[u]=0.005
rndamp[v]=0.005
rndamp[w]=0.0005
rndamp[b]=0.000022
rndexp[u]=0.5
rndexp[v]=0.5
rndexp[w]=2.
rndexp[b]=4.

[boundary]
swboundary=surface
mbcbot=noslip
mbctop=freeslip
sbcbot=flux
sbctop=neumann
sbot=-0.0000000141811461
stop=0.
z0m=0.00001
z0h=0.00001

[buffer]
swbuffer=1
zstart=13.556133298252862
sigma=0.2756644477109
beta=2.

[time]
starttime=0
endtime=%(endtime)s
savetime=100.
outputiter=1
adaptivestep=false
dt=0.5
rkorder=3
"""


def make_sbl_input(wd, ktot=32, zsize=18.074844397670482):
    """Ekman-layer-like initial profiles (the reference case starts from DNS
    data; for testing we use Ug-constant wind + linear stratification)."""
    from microhh_tpu.utils import nc
    import os
    dz = zsize / ktot
    z = np.linspace(0.5 * dz, zsize - 0.5 * dz, ktot)
    ug = 0.05
    f = nc.Dataset(os.path.join(wd, "sbl_input.nc"), "w")
    f.createDimension("z", ktot)
    vz = f.createVariable("z", "f8", ("z",))
    vz[:] = z
    g = f.createGroup("init")
    for name, prof in (("u", np.full(ktot, ug)), ("v", np.zeros(ktot)),
                       ("b", -0.0044 * (1. - z / zsize)),
                       ("u_geo", np.full(ktot, ug)), ("v_geo", np.zeros(ktot))):
        v = g.createVariable(name, "f8", ("z",))
        v[:] = prof
    f.close()


@pytest.mark.parametrize("swdiff", ["dnn_local", "dnn_global", "dnn_stats"])
def test_sbl_dnn_smoke(tmp_path, swdiff):
    """SBL case with a (random-weights) DNN closure: several RK3 steps run
    stably, Tau is produced with the right extent, tendencies stay finite."""
    wd = str(tmp_path)
    ini_text = SBL_INI % {"swdiff": swdiff, "endtime": "2.0"}
    with open(tmp_path / "sbl.ini", "w") as f:
        f.write(ini_text)
    make_sbl_input(wd)
    import os
    os.rename(os.path.join(wd, "sbl_input.nc"), os.path.join(wd, "sbl_input.nc"))

    m = Model(Ini(ini_text), "init", "sbl", workdir=wd)
    m.finish_setup()
    m.save_initial_state()

    m = Model(Ini(ini_text), "run", "sbl", workdir=wd)
    m.finish_setup()
    s, t = m.run()

    for name in ("u", "v", "w", "b"):
        assert np.all(np.isfinite(np.asarray(s[name]))), name

    # Tau extent: levels ks+1 .. kendBL-2
    ctx = m.ctx
    kBL = m.diff.kendBL(ctx)
    s_g = m.boundary.set_ghost_cells(ctx, s, m.final_sfc)
    aux = m.diff.exec_viscosity(ctx, s_g, m.final_sfc, {})
    tau = np.asarray(aux["Tau"])
    assert tau.shape == (6, kBL - 1 - (ctx.ks + 1), ctx.jtot, ctx.itot)
    assert np.all(np.isfinite(tau))


def test_torchscript_roundtrip(tmp_path):
    """End-to-end .pt path: export a tiny CNDNN-style TorchScript module
    (expanded e2cnn 'filter' buffers + change_basis, as the reference's
    analysis/util.py exports produce), load it with TauDNN.from_torchscript,
    and assert Tau parity vs torch execution of the same convs."""
    import torch

    rng = np.random.RandomState(3)
    c1 = 20
    f0 = rng.randn(c1, 12, 3, 3).astype(np.float32) * 0.3
    f1 = rng.randn(6, c1, 1, 1).astype(np.float32) * 0.3
    cb = rng.randn(6, 6).astype(np.float32)

    class CNDNNExport(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # e2cnn R2Conv exports carry the expanded kernel as a buffer
            # named "filter" on each conv block.
            self.register_buffer("c0_filter", torch.from_numpy(f0))
            self.register_buffer("c1_filter", torch.from_numpy(f1))
            self.register_buffer("change_basis", torch.from_numpy(cb))

        def forward(self, x):
            h = torch.nn.functional.conv2d(x, self.c0_filter)
            h = torch.relu(h)
            h = torch.nn.functional.conv2d(h, self.c1_filter)
            h = h.squeeze(-1).squeeze(-1)
            return h @ self.change_basis.t()

    mod = torch.jit.script(CNDNNExport().eval())
    pt = str(tmp_path / "cndnn.pt")
    mod.save(pt)

    net = TauDNN.from_torchscript(pt)
    x = rng.randn(64, 12, 3, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch.jit.load(pt)(torch.from_numpy(x)).numpy()
    out = np.asarray(net(x.reshape(64, -1)))
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()


def test_torchscript_plain_conv_fallback(tmp_path):
    """A plain torch.nn Conv2d export (no e2cnn 'filter' buffers) loads via
    the Conv2d.weight fallback."""
    import torch

    rng = np.random.RandomState(5)
    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(12, 10, 3, bias=False),
        torch.nn.ReLU(),
        torch.nn.Conv2d(10, 6, 1, bias=False),
    ).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.from_numpy(
                    rng.randn(*m.weight.shape).astype(np.float32) * 0.3))
    pt = str(tmp_path / "plain.pt")
    torch.jit.script(tmodel).save(pt)

    net = TauDNN.from_torchscript(pt)
    x = rng.randn(16, 12, 3, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).squeeze(-1).squeeze(-1).numpy()
    ref = ref @ PINV.T  # no change_basis in the export -> PINV default
    out = np.asarray(net(x.reshape(16, -1)))
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()


def test_missing_dnnpath_is_error(tmp_path):
    """Without swdnnrandom=1, a missing dnnpath must raise (silent random
    physics in a production run is never acceptable)."""
    with pytest.raises(ValueError, match="dnnpath"):
        TauDNN.load("/nonexistent/net.pt")
