"""Cross-sections, dumps and column output (reference ``src/cross.cxx``,
``src/dump.cxx``, ``src/column.cxx``).

Binary formats match the reference so its post-processing tools apply:
cross files ``<var>.<xz|yz|xy>.<idx>.<iotime>`` hold one raw slice; dump
files ``<var>.<iotime>`` hold the full interior field; column output is a
NetCDF time series of per-(x,y) profiles.
"""

import os

import numpy as np

from .timeloop import IFACTOR


class Cross:
    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("cross", "swcross", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("cross", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        self.crosslist = ini.get_list(str, "cross", "crosslist", default=[])
        g = model.grid
        self.model = model

        def nearest(vals, coords):
            return [int(np.abs(coords - v).argmin()) for v in vals]

        xz = ini.get_list(float, "cross", "xz", default=[])
        yz = ini.get_list(float, "cross", "yz", default=[])
        xy = ini.get_list(float, "cross", "xy", default=[])
        self.jxz = nearest(xz, g.y)
        self.jxzh = nearest(xz, g.yh)
        self.ixz = nearest(yz, g.x)
        self.ixzh = nearest(yz, g.xh)
        self.kxy = nearest(xy, g.z[g.kstart:g.kend])
        self.kxyh = nearest(xy, g.zh[g.kstart:g.kend + 1])

    def do_cross(self, itime):
        return self.sw and itime % self.isampletime == 0

    def exec(self, s, aux, iotime):
        if not self.sw:
            return
        m = self.model
        g = m.grid
        ks, ke = g.kstart, g.kend
        for name in self.crosslist:
            if name in s:
                data = np.asarray(s[name])
            elif name == "p" and aux is not None and "p" in aux:
                data = np.asarray(aux["p"])
            else:
                continue
            loc = m.fields.mp[name].loc if name in m.fields.mp else (0, 0, 0)
            offset = g.utrans if name == "u" else (g.vtrans if name == "v" else 0.)
            interior = data[ks:ke + (1 if loc[2] else 0)] + offset
            kext = interior.shape[0]

            jlist = self.jxzh if loc[1] else self.jxz
            for j in jlist:
                fname = "%s.xz.%05d.%07d" % (name, j, iotime)
                interior[:, j, :].astype(data.dtype).tofile(
                    os.path.join(m.workdir, fname))
            ilist = self.ixzh if loc[0] else self.ixz
            for i in ilist:
                fname = "%s.yz.%05d.%07d" % (name, i, iotime)
                interior[:, :, i].astype(data.dtype).tofile(
                    os.path.join(m.workdir, fname))
            klist = self.kxyh if loc[2] else self.kxy
            for k in klist:
                fname = "%s.xy.%05d.%07d" % (name, k, iotime)
                interior[k, :, :].astype(data.dtype).tofile(
                    os.path.join(m.workdir, fname))


class Dump:
    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("dump", "swdump", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("dump", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        self.dumplist = ini.get_list(str, "dump", "dumplist", default=[])
        self.model = model

    def do_dump(self, itime):
        return self.sw and itime % self.isampletime == 0

    def exec(self, s, aux, iotime):
        if not self.sw:
            return
        m = self.model
        g = m.grid
        for name in self.dumplist:
            if name in s:
                data = np.asarray(s[name])
            elif name == "p" and aux is not None and "p" in aux:
                data = np.asarray(aux["p"])
            else:
                continue
            fname = os.path.join(m.workdir, "%s.%07d" % (name, iotime))
            data[g.kstart:g.kend].tofile(fname)


class Column:
    """Single-column profile time series (reference ``src/column.cxx``)."""

    def __init__(self, model):
        ini = model.ini
        self.sw = ini.get_str("column", "swcolumn", default="0") not in ("0", "false")
        if not self.sw:
            return
        self.sampletime = ini.get_float("column", "sampletime")
        self.isampletime = int(self.sampletime * IFACTOR + 0.5)
        cx = ini.get_list(float, "column", "coordinates", subitem="x", default=[])
        cy = ini.get_list(float, "column", "coordinates", subitem="y", default=[])
        g = model.grid
        self.cols = [(int(np.abs(g.x - x).argmin()), int(np.abs(g.y - y).argmin()))
                     for x, y in zip(cx, cy)]
        self.model = model

        from .utils import nc
        tl = model.timeloop
        path = os.path.join(model.workdir, "%s.column.%07d.nc"
                            % (model.casename or "run", tl.iotime))
        f = nc.Dataset(path, "w")
        f.createDimension("z", g.ktot)
        f.createDimension("zh", g.ktot + 1)
        f.createDimension("col", max(len(self.cols), 1))
        f.createDimension("time", None)
        f.createVariable("z", "f8", ("z",))[:] = g.z[g.kstart:g.kend]
        f.createVariable("zh", "f8", ("zh",))[:] = g.zh[g.kstart:g.kend + 1]
        self.v_time = f.createVariable("time", "f8", ("time",))
        self.vars = {}
        for name in model.fields.prognostic_names:
            zdim = "zh" if name == "w" else "z"
            self.vars[name] = f.createVariable(name, "f8", ("time", "col", zdim))
        self.file = f
        self._idx = 0

    def do_column(self, itime):
        return self.sw and itime % self.isampletime == 0

    def exec(self, s, time):
        if not self.sw or not self.cols:
            return
        m = self.model
        g = m.grid
        ks, ke = g.kstart, g.kend
        i = self._idx
        self.v_time[i] = time
        for name, var in self.vars.items():
            data = np.asarray(s[name])
            hi = ke + 1 if name == "w" else ke
            for c, (ix, jy) in enumerate(self.cols):
                var[i, c] = data[ks:hi, jy, ix]
        self._idx += 1
        self.file.sync()

    def close(self):
        if self.sw:
            self.file.close()
