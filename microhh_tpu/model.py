"""Model orchestration: builds the jitted time step and runs the host loop.

Reference: ``src/model.cxx``.  The whole RK3/RK4 iteration (all substeps,
including ghost-cell fills, all physics tendencies, the Poisson solve and the
low-storage RK update) is traced into ONE jitted device function `step(state,
dt)`; dt is a traced scalar so adaptive stepping never recompiles.  Host code
only does integer-time bookkeeping, the adaptive-dt reduction fetch, status
output and restart I/O — mirroring the reference's main loop
(``src/model.cxx:303-557``) with the device/host split redrawn for TPU.
"""

import os
import time as _time

import numpy as np
import jax
import jax.numpy as jnp

from .config import Ini
from .grid import Grid
from .fields import Fields
from .timeloop import Timeloop, IFACTOR
from . import ops
from .ops.stencil import ip, jp, i2
from .ops.boundary import set_ghost_cells_w


class Context:
    """Static (non-traced) grid/metric constants closed over by the step."""

    def __init__(self, grid, fields, dtype):
        self.dtype = dtype
        g = grid
        self.ks, self.ke = g.kstart, g.kend
        self.itot, self.jtot, self.ktot = g.itot, g.jtot, g.ktot
        self.kcells = g.kcells
        self.spatial_order = g.spatial_order
        self.dx, self.dy = g.dx, g.dy
        self.dxi, self.dyi = dtype(g.dxi), dtype(g.dyi)
        self.zsize = g.zsize
        self.utrans, self.vtrans = g.utrans, g.vtrans
        for name in ("z", "zh", "dz", "dzh", "dzi", "dzhi"):
            setattr(self, name, jnp.asarray(getattr(g, name), dtype=dtype))
        for name in ("dzi4", "dzhi4"):
            v = getattr(g, name, None)
            setattr(self, name, None if v is None else jnp.asarray(v, dtype=dtype))
        for name in ("dzhi4bot", "dzhi4top"):
            v = getattr(g, name, None)
            setattr(self, name, None if v is None else float(v))
        self.rhoref = jnp.asarray(fields.rhoref, dtype=dtype)
        self.rhorefh = jnp.asarray(fields.rhorefh, dtype=dtype)
        self.scalar_names = tuple(fields.sp.keys())
        # numpy copies for host-side math (kernel weight-table builders
        # MUST read these: np.asarray(<device array>, dtype=...) compiles
        # a cast on the device — minutes through a tunneled chip)
        self.np_dz = grid.dz
        self.np_z = grid.z
        for name in ("dzi", "dzhi", "dzi4", "dzhi4"):
            v = getattr(g, name, None)
            setattr(self, "np_" + name,
                    None if v is None else np.asarray(v, dtype=np.float64))
        self.np_rhoref = np.asarray(fields.rhoref, dtype=np.float64)
        self.np_rhorefh = np.asarray(fields.rhorefh, dtype=np.float64)

    def refresh_basestate(self, fields):
        self.rhoref = jnp.asarray(fields.rhoref, dtype=self.dtype)
        self.rhorefh = jnp.asarray(fields.rhorefh, dtype=self.dtype)
        self.np_rhoref = np.asarray(fields.rhoref, dtype=np.float64)
        self.np_rhorefh = np.asarray(fields.rhorefh, dtype=np.float64)


class Model:
    def __init__(self, ini, sim_mode, casename="", workdir=".", dtype=None):
        if isinstance(ini, str):
            ini = Ini(ini)
        self.ini = ini
        self.sim_mode = sim_mode
        self.casename = casename
        self.workdir = workdir

        if dtype is None:
            dtype = np.float64 if jax.config.read("jax_enable_x64") else np.float32
        self.dtype = dtype

        # Input NetCDF (profiles); optional for pure-vortex cases.
        self.input_nc = None
        nc_path = os.path.join(workdir, "%s_input.nc" % casename)
        if os.path.exists(nc_path):
            from .utils import nc
            self.input_nc = nc.Dataset(nc_path, "r")

        # [master] npx/npy: the reference Master reads the process-grid
        # decomposition in every mode (master_serial.cxx:61); here the
        # device mesh plays that role, so the values are consumed and kept
        # as the REQUESTED decomposition for set_mesh callers.
        self.npx_req = ini.get_int("master", "npx", default=1)
        self.npy_req = ini.get_int("master", "npy", default=1)
        self.grid = Grid(ini)
        if self.input_nc is not None and "z" in self.input_nc.variables:
            self.grid.set_z(np.asarray(self.input_nc.variables["z"][:self.grid.ktot]))
        else:
            # Uniform grid fallback.
            dz = self.grid.zsize / self.grid.ktot
            self.grid.set_z(np.linspace(0.5 * dz, self.grid.zsize - 0.5 * dz, self.grid.ktot))

        self.fields = Fields(ini, self.grid)
        # Thermo and microphysics register their prognostic scalars before
        # the BC table is built.
        self.thermo = ops.make_thermo(ini, self.grid, self.fields)
        from .ops.microphys import make_microphys
        self.micro = make_microphys(ini, self.grid, self.fields)
        self.micro.thermo = self.thermo
        from .ops.radiation import make_radiation
        self.radiation = make_radiation(ini, self.grid)
        self.boundary = ops.make_boundary(ini, self.fields, self.grid)
        self.soil_grid = getattr(self.boundary, "soil_grid", None)
        if getattr(self.boundary, "is_lsm", False):
            self.boundary.radiation = self.radiation
            self.boundary.micro = self.micro
        self.advec = ops.make_advec(ini, self.grid, self.fields)
        self.diff = ops.make_diff(ini, self.grid, self.fields, self.boundary)
        # Cross-wiring (the reference passes Thermo& into these at exec time).
        if hasattr(self.diff, "thermo"):
            self.diff.thermo = self.thermo
        if hasattr(self.boundary, "thermo"):
            self.boundary.thermo = self.thermo
        self.pres = ops.make_pres(ini, self.grid, self.fields, dtype)
        self.force = self._make_force()
        self.buffer = self._make_buffer()
        self.limiter = self._make_limiter()
        from .ops.decay import make_decay
        from .ops.source import make_source
        self.decay = make_decay(ini, self.fields)
        self.source = make_source(ini, self.grid, self.fields, self.input_nc)
        self.stats = None   # attached by run_case
        self.cross = None
        self.dump = None
        self.column = None

        self.timeloop = Timeloop(ini, sim_mode)
        from .timedep import BoundaryTimedep
        self.btimedep = BoundaryTimedep(ini, self.fields, self.input_nc)
        # [grid] swtimedep: lat/lon follow a trajectory over the
        # time_latlon axis (grid.cxx:387-401); the interpolated values ride
        # in the carried state for the solar-position consumers.
        self.grid_tdep = {}
        if ini.get_bool("grid", "swtimedep", default=False):
            from .timedep import Timedep
            self.grid_tdep = {
                "lat": Timedep(self.input_nc, "lat", "time_latlon"),
                "lon": Timedep(self.input_nc, "lon", "time_latlon")}
        from .timedep import Sbot2D
        self.sbot2d = Sbot2D(ini, self.fields)
        from .ops.boundary_outflow import BoundaryOutflow
        self.outflow = BoundaryOutflow(
            ini, self.grid, ini.get_int("grid", "swspatialorder", default=2))
        from .ops.immersed_boundary import ImmersedBoundary
        self.ib = ImmersedBoundary(ini, self.grid, self.fields)
        if self.outflow.active and self.input_nc is not None:
            self.outflow.create(self.input_nc)
        # [master] wallclocklimit in hours (reference master.cxx:80-89):
        # within 10 minutes of it, steer to an io time, save and stop.
        self.wallclocklimit = ini.get_float("master", "wallclocklimit",
                                            default=1.e8)
        self._wall_start = _time.time()

        self._step_fn = None
        self._limits_fn = None
        self._diag_fn = None
        self._last_sfc = None
        self._last_wallclock = _time.time()

    def at_wall_clock_limit(self):
        return (_time.time() - self._wall_start) > self.wallclocklimit * 3600. - 600.

    def _make_force(self):
        from .ops.force import make_force
        return make_force(self.ini, self.grid, self.fields, self.input_nc)

    def _make_buffer(self):
        from .ops.buffer import make_buffer
        return make_buffer(self.ini, self.grid, self.fields, self.input_nc)

    def _make_limiter(self):
        from .ops.limiter import Limiter
        return Limiter(self.ini, self.fields)

    # ------------------------------------------------------------------
    def finish_setup(self):
        """Base state + solver precomputation; call before init/run."""
        self.thermo.create_basestate(self.input_nc)
        if self.soil_grid is not None:
            self.soil_grid.create(self.input_nc)
            self.boundary.create(self.input_nc, self.workdir, dtype=self.dtype)
        if self.ib.active:
            self.ib.create(self.workdir)
        if hasattr(self.boundary, "load_z0") and not getattr(
                self.boundary, "sw_constant_z0", True):
            self.boundary.load_z0(self.workdir)
        if hasattr(self.radiation, "create"):
            self.radiation.create(self.input_nc, self.thermo,
                                  workdir=self.workdir)
        self.ctx = Context(self.grid, self.fields, self.dtype)
        self.pres.set_values()

    # ------------------------------------------------------------------
    #  init mode
    # ------------------------------------------------------------------
    def save_initial_state(self):
        tl = self.timeloop
        state = self.fields.create(self.input_nc, dtype=self.dtype)
        if getattr(self.boundary, "is_lsm", False):
            sfc0 = self.boundary.init_surface_state(dtype=self.dtype)
            state, sfc0 = self.boundary.create_cold_start(
                self.input_nc, state, sfc0, dtype=self.dtype,
                workdir=self.workdir)
            self.boundary.save(sfc0, 0, self.workdir)
        elif getattr(self.boundary, "is_surface", False):
            # MOST warm-start state (obuk, MO gradients, flux gradbots)
            # must be part of every restart chain (boundary_surface.cxx
            # save) so leg-2 runs are bitwise identical.
            sfc0 = self.boundary.init_surface_state(dtype=self.dtype)
            self.boundary.save(sfc0, 0, self.workdir)
        self.grid.save(os.path.join(self.workdir, "grid.%07d" % 0))
        self.fields.save(state, 0, self.workdir)
        tl.save(0, self.workdir)
        if hasattr(self.thermo, "save_basestate"):
            self.thermo.save_basestate(0, self.workdir)
        from .utils import fastio
        fastio.flush()  # init files must be on disk when we return
        return state

    def set_mesh(self, mesh):
        """Declare the device mesh for a multi-chip run.  The Poisson
        solvers then force slab-transpose reshards around their FFTs
        (parallel/mesh.py SlabPlan) instead of GSPMD's default all-gather;
        the Pallas fused kernels run per shard inside shard_map with a
        ppermute halo exchange (parallel/halo.py) when the shard planes
        fit VMEM, else the XLA stencil path (rolls lower to ICI
        collective-permutes)."""
        self.mesh = mesh
        self.pres.mesh = mesh
        self.micro.mesh = mesh  # column-local kernels run per shard

    mesh = None

    # ------------------------------------------------------------------
    #  step construction
    # ------------------------------------------------------------------
    def build_step(self):
        ctx = self.ctx
        tl = self.timeloop
        cA, cB = tl.rk_ca, tl.rk_cb
        nsub = tl.n_substeps
        names = self.fields.all_prognostic_names

        is_surface = getattr(self.boundary, "is_surface", False)

        # Large precomputed solver arrays travel as jit ARGUMENTS (not
        # closure constants) so they are not embedded as HLO literals —
        # giant literals blow up compile payloads and duplicate HBM.
        self.pres_params = self.pres.device_params()

        # Pallas-fused hot path (advec_2 + diff_smag2 + buoyancy in one
        # HBM pass per substep).  Auto-enabled on TPU for the matching
        # config when the (jtot, itot) plane set fits VMEM.
        fused = self._maybe_build_fused()
        self._fused = fused  # introspection (tests, perf tooling)
        self._o4_fused = self._maybe_build_o4_fused()

        fold_ghosts = fused is not None and fused.fold_ghosts

        # RK-fold fast path: the fused tendency kernels also produce the
        # pre-projection state s* = s + cB*dt*t and the scaled carry
        # cA_next*t in-register, killing the separate whole-state XLA
        # axpy+scale passes (timeloop.cxx:250-285).  Valid only when NO op
        # modifies the tendency between the kernels and the RK update.
        use_rkfold = False
        if (fused is not None and not fused.generic
                and os.environ.get("MICROHH_RKFOLD", "1") == "1"):
            from .ops.pres_2 import Pres2
            from .ops.microphys import MicrophysDisabled
            from .ops.radiation import RadiationDisabled
            from .ops.force import Force
            from .ops import DisabledOp
            pres_ok = isinstance(self.pres, (Pres2,)) or isinstance(
                self.pres, DisabledOp)
            force_idle = (getattr(self, "_skip_force", False)
                          or type(self.force).__name__ == "_NoForce"
                          or (type(self.force) is Force
                              and self.force.swlspres == "0"
                              and self.force.swls == "0"
                              and self.force.swwls == "0"
                              and getattr(self.force, "swnudge", "0") == "0"))
            buffer_idle = (getattr(self, "_skip_buffer", False)
                           or type(self.buffer).__name__ == "_NoBuffer")
            use_rkfold = (
                pres_ok
                and isinstance(self.micro, MicrophysDisabled)
                and isinstance(self.radiation, RadiationDisabled)
                and not getattr(self.boundary, "is_lsm", False)
                and not self.ib.active and not self.outflow.active
                and not getattr(self.decay, "dmap", None)
                and not getattr(self.source, "sw", False)
                and not getattr(self.limiter, "limitlist", None)
                and force_idle and buffer_idle)
        self._use_rkfold = use_rkfold

        # Generic-path RK fold (moist/vapor/buoy + any scalar list — the
        # bomex/rico class): every tendency producer that is ADDITIVE and
        # does not READ t (thermo, microphysics, radiation, buffer, decay,
        # source, geo/ls/subsidence/nudge forcing, the limiter via its
        # s*-clamp form) moves BEFORE the tendency kernels so the fold
        # sees the total; excluded: uflux forcing (reads t), IB/outflow
        # (modify s/t non-additively), LSM (soil/wl prognostics live
        # outside the kernel set).  Sharded meshes run the per-shard rk
        # kernels inside one shard_map region (pallas_fused
        # fused_generic_tendencies_rk sharded branch).
        use_rkfold_generic = False
        if (fused is not None and fused.generic
                and os.environ.get("MICROHH_RKFOLD", "1") == "1"):
            from .ops.pres_2 import Pres2
            from .ops.force import Force
            from .ops import DisabledOp
            pres_ok = isinstance(self.pres, (Pres2, DisabledOp))
            force_ok = (getattr(self, "_skip_force", False)
                        or type(self.force).__name__ == "_NoForce"
                        or (type(self.force) is Force
                            and self.force.swlspres != "uflux"))
            use_rkfold_generic = (
                pres_ok and force_ok
                and not getattr(self.boundary, "is_lsm", False)
                and not self.ib.active and not self.outflow.active)
        self._use_rkfold_generic = use_rkfold_generic

        # Column fold (generic path): buffer/decay/force collapse into
        # per-level tables applied in-kernel (pallas_fused
        # generic_col_tables), killing their separate whole-field passes.
        col_fold = False
        if use_rkfold_generic and os.environ.get("MICROHH_COLFOLD",
                                                 "1") == "1":
            from .ops.force import Force
            f = self.force
            scalars = set(ctx.scalar_names)
            force_ok = type(f).__name__ == "_NoForce" or (
                type(f) is Force
                and f.swlspres in ("0", "geo", "dpdx")
                and set(getattr(f, "lslist", ())) <= scalars | {"u", "v"}
                and set(getattr(f, "nudgelist", ())) <= scalars | {"u", "v"})
            col_fold = force_ok
            if col_fold and type(f) is Force and f.swlspres == "geo":
                fused.fold_coriolis = True
                fused.fc = float(f.fc)
        self._col_fold = col_fold

        pres_active_rk = ((use_rkfold or use_rkfold_generic)
                          and hasattr(self.pres, "exec_star"))
        # Single-pass Pallas kernels for the projection glue (divergence
        # rhs + gradient application) — see pallas_fused.PresGlue.
        pres_glue = None
        if (pres_active_rk
                and os.environ.get("MICROHH_PRES_FUSED", "1") == "1"):
            from .ops.pallas_fused import PresGlue
            # Sharded: the glue kernels run per shard on halo-padded
            # planes, so their specs take the LOCAL padded (jtot, itot)
            # that fused.ctx already carries.
            pres_glue = PresGlue(fused.ctx, fused.interpret)
            pres_glue.sharded_mesh = fused.sharded_mesh

        def substep(s, t, sfc, aux, pp, dt, time_s, sub):
            if not fold_ghosts:
                s = self.boundary.set_ghost_cells(ctx, s, sfc)
            if getattr(self.thermo, "swupdatebasestate", False):
                aux = self.thermo.update_basestate(ctx, s, dict(aux), sfc)
            if fused is not None and fused.generic:
                from .ops.pallas_fused import fused_generic_viscosity
                aux = fused_generic_viscosity(fused, ctx, s, sfc, aux,
                                              self.thermo)
                t = self.thermo.exec(ctx, s, t, aux)
            elif fused is not None:
                from .ops.pallas_fused import (fused_exec_viscosity,
                                               fused_tendencies)
                if (use_rkfold and getattr(fused, "fold_evisc", False)
                        and fused.sharded_mesh is None):
                    # evisc rides the RK kernel sweep; only the MOST
                    # surface row is computed here (2-D XLA) so it sees
                    # the PREVIOUS substep's MO gradients, exactly like
                    # the standalone pass (model.cxx runs exec_viscosity
                    # before boundary->exec)
                    if fused.smag.surface:
                        from .ops.pallas_fused import _surface_evisc_row
                        aux = dict(aux)
                        aux["se_row"] = _surface_evisc_row(
                            fused.smag, ctx, s, sfc, fused.has_thermo)
                else:
                    aux = fused_exec_viscosity(fused, ctx, s, sfc, aux)
            else:
                aux = self.diff.exec_viscosity(ctx, s, sfc, aux)
                t = self.thermo.exec(ctx, s, t, aux)
            t, aux = self.micro.exec(ctx, s, t, aux, dt)
            t, sfc = self.radiation.exec(ctx, s, t, sfc, aux, time_s,
                                         self.thermo)
            if getattr(self.boundary, "is_lsm", False):
                sfc, t = self.boundary.exec_lsm(ctx, s, t, sfc, aux,
                                                cB[sub] * dt)
            else:
                sfc = self.boundary.exec(ctx, s, sfc, aux)
            if is_surface and not fold_ghosts:
                # Refill only the ghosts that depend on the just-computed
                # surface fluxes (reference refills everything,
                # model.cxx:377, but momentum/w ghosts are flux-independent
                # under non-ustar BCs — skipping them saves full-array
                # rewrites).
                s = self.boundary.set_ghost_cells(
                    ctx, s, sfc, names=self.boundary.flux_ghost_names())
            if self.ib.active:
                s = self.ib.exec_scalars(ctx, s)
            if use_rkfold_generic:
                from .ops.pallas_fused import (fused_generic_tendencies_rk,
                                               fused_pressure_rk)
                ks, ke = ctx.ks, ctx.ke
                subdt = cB[sub] * dt
                aux = dict(aux)
                aux["subdt"] = subdt
                # additive tendency producers move BEFORE the kernels
                if fused.no_advec:
                    # 2i* advection is an additive producer that does not
                    # read t, so running it here keeps the fold exact;
                    # fused Pallas stencil when built, XLA op otherwise
                    adv = fused.advec_pallas or self.advec
                    t = adv.exec(ctx, s, t, aux)
                cols = None
                if col_fold:
                    from .ops.pallas_fused import generic_col_tables
                    cols = generic_col_tables(fused, ctx, s, sfc, aux,
                                              self.force, self.buffer,
                                              self.decay)
                    t = self.source(ctx, s, t, aux, sfc)
                else:
                    if not getattr(self, "_skip_buffer", False):
                        t = self.buffer(ctx, s, t, aux)
                    t = self.decay(ctx, s, t, aux)
                    t = self.source(ctx, s, t, aux, sfc)
                    if not getattr(self, "_skip_force", False):
                        t = self.force(ctx, s, t, aux, sfc)
                can = cA[(sub + 1) % nsub]
                carry = can != 0.
                s_star, t_s = fused_generic_tendencies_rk(
                    fused, ctx, s, t, aux, sfc, subdt, can, carry=carry,
                    cols=cols)
                if pres_glue is not None:
                    s_new, t_new, aux = fused_pressure_rk(
                        pres_glue, ctx, self.pres, s_star, t_s, aux,
                        subdt, can, pp, carry)
                elif pres_active_rk:
                    (gx, gy, gz), aux = self.pres.exec_star(
                        ctx, s_star, aux, subdt, pp)
                    s_new = dict(s_star)
                    s_new["u"] = s_star["u"] - subdt * gx
                    s_new["v"] = s_star["v"] - subdt * gy
                    s_new["w"] = s_star["w"] - subdt * gz
                    t_new = dict(t_s)
                    if carry:
                        cv = ctx.dtype(can)
                        t_new["u"] = t_s["u"] - cv * gx
                        t_new["v"] = t_s["v"] - cv * gy
                        t_new["w"] = t_s["w"] - cv * gz
                else:
                    s_new, t_new = s_star, dict(t_s)
                # limiter as the s*-clamp it is equivalent to: the
                # reference applies it AFTER pressure (limiter.h:36-57;
                # max(t, -s/dt) <=> s_new = max(s + dt*t, 0))
                if getattr(self.limiter, "limitlist", None):
                    cv = ctx.dtype(can)
                    for name in self.limiter.limitlist:
                        if name not in s_new:
                            continue
                        sold = s_new[name]
                        sclip = sold.at[ks:ke].set(
                            jnp.maximum(sold[ks:ke], 0.))
                        if carry:
                            t_new[name] = t_new[name].at[ks:ke].add(
                                cv * (sclip[ks:ke] - sold[ks:ke]) / subdt)
                        s_new[name] = sclip
                if not carry:
                    t_new = {n: jnp.zeros_like(s[n]) for n in names}
                return s_new, t_new, sfc, aux
            if use_rkfold:
                from .ops.pallas_fused import (fused_pressure_rk,
                                               fused_tendencies_rk)
                subdt = cB[sub] * dt
                can = cA[(sub + 1) % nsub]
                carry = can != 0.
                # sub == 0: nothing on the rkfold path touches t before
                # the kernel and cA[0] == 0, so the carried t is literal
                # zeros — the 'first' kernel variant skips reading it and
                # the zero buffers are never materialized (DCE'd).
                # Tiled fold_ghosts variant: the Poisson rhs is emitted by
                # the same kernel sweep (one fewer pass over u*/v*/w*).
                want_rhs = (pres_glue is not None and fused.tiled
                            and fused.fold_ghosts
                            and os.environ.get("MICROHH_RHS_FOLD", "1") == "1")
                s_star, t_s, rhs = fused_tendencies_rk(
                    fused, ctx, s, t, aux, sfc, subdt, can,
                    first=(sub == 0),
                    rhs_dti=(1. / subdt) if want_rhs else None)
                aux = dict(aux)
                aux["subdt"] = subdt
                if pres_glue is not None:
                    s_new, t_new, aux = fused_pressure_rk(
                        pres_glue, ctx, self.pres, s_star, t_s, aux,
                        subdt, can, pp, carry, rhs=rhs)
                    if not carry:
                        t_new = {n: jnp.zeros_like(s[n]) for n in names}
                    return s_new, t_new, sfc, aux
                if pres_active_rk:
                    (gx, gy, gz), aux = self.pres.exec_star(
                        ctx, s_star, aux, subdt, pp)
                    s_new = dict(s_star)
                    s_new["u"] = s_star["u"] - subdt * gx
                    s_new["v"] = s_star["v"] - subdt * gy
                    s_new["w"] = s_star["w"] - subdt * gz
                else:
                    s_new = s_star
                if carry:
                    t_new = dict(t_s)
                    if pres_active_rk:
                        cv = ctx.dtype(can)
                        t_new["u"] = t_s["u"] - cv * gx
                        t_new["v"] = t_s["v"] - cv * gy
                        t_new["w"] = t_s["w"] - cv * gz
                else:
                    t_new = {n: jnp.zeros_like(s[n]) for n in names}
                return s_new, t_new, sfc, aux
            # Conservation-type w ghosts around advec and pres; normal
            # ghosts for diff (model.cxx:387-412).  No-op at 2nd order.
            if ctx.spatial_order == 4:
                s_cons = dict(s)
                s_cons["w"] = set_ghost_cells_w(ctx, s["w"], conservation=True)
            else:
                s_cons = s
            if fused is not None and fused.generic:
                from .ops.pallas_fused import fused_generic_tendencies
                if fused.no_advec:
                    adv = fused.advec_pallas or self.advec
                    t = adv.exec(ctx, s_cons, t, aux)
                t = fused_generic_tendencies(fused, ctx, s, t, aux, sfc)
            elif fused is not None:
                t = fused_tendencies(fused, ctx, s, t, aux, sfc)
            elif self._o4_fused is not None:
                # fused advec_4 + diff_4 producer (ops/o4_pallas)
                t = self._o4_fused.exec(ctx, s_cons, s, t, aux)
            else:
                t = self.advec.exec(ctx, s_cons, t, aux)
                t = self.diff.exec(ctx, s, t, aux, sfc)
            if self.outflow.active:
                t = self.outflow.correct(
                    ctx, s, t, aux,
                    tPr=getattr(self.diff, "tPr", 1.),
                    sviscs=getattr(self.diff, "viscs", None))
            subdt = cB[sub] * dt
            aux = dict(aux)
            aux["subdt"] = subdt
            if not (fused is not None and getattr(self, "_skip_buffer", False)):
                t = self.buffer(ctx, s, t, aux)
            t = self.decay(ctx, s, t, aux)
            t = self.source(ctx, s, t, aux, sfc)
            if not (fused is not None and getattr(self, "_skip_force", False)):
                t = self.force(ctx, s, t, aux, sfc)
            if self.ib.active:
                s = self.ib.exec_momentum(ctx, s)
                s_cons = s if ctx.spatial_order != 4 else dict(
                    s, w=set_ghost_cells_w(ctx, s["w"], conservation=True))
            t, aux = self.pres.exec(ctx, s_cons, t, aux, subdt, pp)
            t = self.limiter(ctx, s, t, aux, subdt)
            # Low-storage RK update (timeloop.cxx:250-334).  Tendency ghost
            # levels are always zero, so whole-array updates are safe.
            s = {n: s[n] + (cB[sub] * dt) * t[n] for n in names}
            can = cA[(sub + 1) % nsub]
            if can != 0.:
                t = {n: t[n] * ctx.dtype(can) for n in names}
            else:
                # cA[0] == 0 for both RK3 and RK4: the tendency restarts
                # from zero every step, so it is never carried state —
                # literal zeros let XLA fold the first accumulations.
                t = {n: jnp.zeros_like(s[n]) for n in names}
            return s, t, sfc, aux

        def step(s, sfc, pp, dt, time_s):
            aux = {}
            t = {n: jnp.zeros_like(s[n]) for n in names}
            for sub in range(nsub):
                s, t, sfc, aux = substep(s, t, sfc, aux, pp, dt, time_s, sub)
            return s, sfc, aux

        # Slim adaptive-dt limits: ONE fused read of (u,v,w,th) emits the
        # per-k plane maxima of the CFL rate and evisc; the per-k dt
        # factors and the MOST surface row are applied outside (max
        # commutes with positive per-plane scalings, so the dt limits
        # match the cfl_max + evisc-kernel + get_dn path this replaces to
        # fma-contraction ulps — that path re-read the velocities and
        # materialized a full evisc field each step).
        use_slim_limits = (fused is not None and not fused.generic
                           and fused.sharded_mesh is None
                           and os.environ.get("MICROHH_SLIM_LIMITS",
                                              "1") == "1")

        def limits(s, sfc):
            out = {}
            if use_slim_limits:
                from .ops.pallas_fused import _surface_evisc_row
                s_in = s if fold_ghosts else \
                    self.boundary.set_ghost_cells(ctx, s, sfc)
                cflk, evk = fused.limits_pass(
                    s_in["u"], s_in["v"], s_in["w"], s_in.get("th"))
                out["cfl_rate"] = jnp.max(cflk)
                if fused.smag.surface:
                    row = _surface_evisc_row(fused.smag, ctx, s_in, sfc,
                                             fused.has_thermo)
                    evk = evk.at[0].set(jnp.max(row))
                tprfac_i = 1. / min(1., self.diff.tPr)
                dxidxi = ctx.dxi ** 2
                dyidyi = ctx.dyi ** 2
                dzi2 = ctx.dzi[ctx.ks:ctx.ke] ** 2
                out["dn_rate"] = jnp.max(jnp.abs(
                    evk * tprfac_i * (dxidxi + dyidyi + dzi2)))
                mrate = self.micro.get_time_limit_rate(ctx, s)
                if mrate is not None:
                    out["micro_rate"] = mrate
                return out
            cfl = self.advec.cfl_max(ctx, s)
            if cfl is not None:
                out["cfl_rate"] = cfl
            if fused is not None:
                # reuse the fused evisc kernel (one HBM pass) for dnmul
                from .ops.pallas_fused import (fused_exec_viscosity,
                                               fused_generic_viscosity)
                s_in = s if fold_ghosts else \
                    self.boundary.set_ghost_cells(ctx, s, sfc)
                if fused.generic:
                    aux = fused_generic_viscosity(fused, ctx, s_in, sfc, {},
                                                  self.thermo)
                else:
                    aux = fused_exec_viscosity(fused, ctx, s_in, sfc, {})
                if "evisc_int" in aux:
                    aux = {"evisc": _pad_limits(aux["evisc_int"])}
                dn = self.diff.get_dn(ctx, s_in, aux)
            else:
                s_g = self.boundary.set_ghost_cells(ctx, s, sfc)
                aux = self.diff.exec_viscosity(ctx, s_g, sfc, {})
                dn = self.diff.get_dn(ctx, s_g, aux)
            if dn is not None:
                out["dn_rate"] = dn
            mrate = self.micro.get_time_limit_rate(ctx, s)
            if mrate is not None:
                out["micro_rate"] = mrate
            return out

        def _pad_limits(ev_int):
            # get_dn only reads the interior; pad cheaply to kcells
            return jnp.pad(ev_int, ((ctx.ks, ctx.kcells - ctx.ke),
                                    (0, 0), (0, 0)))

        def diagnostics(s, sfc):
            # Ghost cells are filled before the checks, like the reference's
            # print_status which runs after set_ghost_cells.  The divergence
            # check uses conservation-type w ghosts at 4th order — the ghost
            # type under which the pressure projection is exact.
            s = self.boundary.set_ghost_cells(ctx, s, sfc)
            if ctx.spatial_order == 4:
                s = dict(s)
                s["w"] = set_ghost_cells_w(ctx, s["w"], conservation=True)
            ks, ke = ctx.ks, ctx.ke
            u, v, w = s["u"], s["v"], s["w"]
            dzc = ctx.dz[ks:ke][:, None, None]
            norm = ctx.itot * ctx.jtot * ctx.zsize
            mom = jnp.sum((i2(u, ip(u))[ks:ke] + i2(v, jp(v))[ks:ke]
                           + i2(w[ks:ke], w[ks + 1:ke + 1])) * dzc) / norm
            tke = 0.5 * jnp.sum((i2(u * u, ip(u) ** 2)[ks:ke]
                                 + i2(v * v, jp(v) ** 2)[ks:ke]
                                 + i2(w[ks:ke] ** 2, w[ks + 1:ke + 1] ** 2)) * dzc) / norm
            out = {"div": self.pres.divergence_max(ctx, s), "mom": mom, "tke": tke}
            if ctx.scalar_names:
                first = ctx.scalar_names[0]
                out["mass"] = jnp.sum(s[first][ks:ke] * dzc) / norm
            else:
                out["mass"] = jnp.zeros((), ctx.dtype)
            return out

        self._step_raw = step
        self._limits_raw = limits
        self._step_fn = jax.jit(step, donate_argnums=(0, 1))
        self._limits_fn = jax.jit(limits)
        self._diag_fn = jax.jit(diagnostics)

    def _maybe_build_fused(self):
        """Build the Pallas fused kernel set when the config matches."""
        if os.environ.get("MICROHH_FUSED", "1") != "1":
            return None
        if getattr(self, "force_fused", None) is False:
            return None
        ctx = self.ctx
        from .ops.advec_2 import Advec2
        from .ops.advec_interp import AdvecInterp
        from .ops.diff_smag2 import DiffSmag2
        from .ops.thermo import ThermoDisabled
        from .ops.thermo_dry import ThermoDry
        has_thermo = isinstance(self.thermo, ThermoDry)
        if not (ctx.spatial_order == 2
                and type(self.diff) is DiffSmag2):
            return None
        if isinstance(self.advec, AdvecInterp):
            # 2i* interpolated schemes: advection is an additive tendency
            # producer before the kernels; diffusion, the folds and the RK
            # update run on the generic fused path.  When the config
            # allows, the producer itself is the fused Pallas stencil
            # (advec_interp_pallas) instead of the XLA op pipeline.
            fused = self._maybe_build_fused_generic(ctx)
            if fused is not None:
                fused.no_advec = True
                mesh = fused.sharded_mesh
                from .ops.advec_interp_pallas import ADV_HALO
                jl = ctx.jtot // (mesh.shape.get("y", 1) if mesh else 1)
                il = ctx.itot // (mesh.shape.get("x", 1) if mesh else 1)
                if mesh is not None:
                    jl, il = jl + 2 * ADV_HALO, il + 2 * ADV_HALO
                plane = jl * il * np.dtype(self.dtype).itemsize
                ok_shard = (mesh is None
                            or min(jl, il) >= 4 * ADV_HALO)
                if (plane * 56 <= 90 << 20 and ok_shard
                        and os.environ.get("MICROHH_ADVEC_PALLAS",
                                           "1") == "1"):
                    from .ops.advec_interp_pallas import AdvecInterpPallas
                    fused.advec_pallas = AdvecInterpPallas(
                        self.advec, ctx, self.dtype,
                        interpret=fused.interpret, mesh=mesh)
            return fused
        if type(self.advec) is not Advec2:
            return None
        # Mosaic cannot lower f64 kernels (its convert_element_type
        # lowering recurses forever, jax 0.8); double precision on a real
        # TPU runs the pure-XLA op pipeline instead.
        if (np.dtype(self.dtype) == np.float64
                and jax.default_backend() == "tpu"):
            return None
        specialized = ((has_thermo and ctx.scalar_names == ("th",))
                       or (isinstance(self.thermo, ThermoDisabled)
                           and ctx.scalar_names == ()))
        if not specialized:
            return self._maybe_build_fused_generic(ctx)
        interpret = jax.default_backend() != "tpu"
        if interpret and not getattr(self, "force_fused", False):
            return None  # CPU: keep the jnp path (tests use force_fused)
        # Fold buffer/Coriolis into the tendency kernel when their configs
        # are kernel-representable (static profiles, f-plane geo forcing);
        # anything else stays on the separate jnp path.
        from .ops.buffer import Buffer
        from .ops.force import Force
        fold_buffer = None
        if isinstance(self.buffer, Buffer) and not self.buffer.swupdate:
            fold_buffer = self.buffer
        fold_force = None
        if (isinstance(self.force, Force) and self.force.swlspres == "geo"
                and not self.force.tdep_geo
                and self.force.swls == "0" and self.force.swwls == "0"
                and self.force.swnudge == "0"):
            fold_force = self.force
        self._skip_buffer = fold_buffer is not None
        self._skip_force = fold_force is not None
        # Ghost-free kernels (clamped index maps): valid when all ghost
        # consumers inside the substep are the fused kernels themselves,
        # the walls are handled by the XLA patches (needs the MOST surface
        # model), and the top BCs are zero-gradient for u/v with a
        # Neumann/flux scalar top (clamp == ghost there).
        from .ops.boundary import NEUMANN, FLUX
        from .ops.radiation import RadiationDisabled
        fold_ghosts = False
        top_grad_th = 0.
        if (getattr(self.boundary, "is_surface", False)
                and not getattr(self.boundary, "is_lsm", False)
                and not self.ib.active and not self.outflow.active
                and isinstance(self.radiation, RadiationDisabled)):
            bcs = self.boundary.bcs
            mom_ok = all(bcs[n].bctop == NEUMANN and bcs[n].top == 0.
                         for n in ("u", "v"))
            th_ok = (not has_thermo) or bcs["th"].bctop in (NEUMANN, FLUX)
            if mom_ok and th_ok:
                fold_ghosts = True
                if has_thermo:
                    bc = bcs["th"]
                    grad = bc.top
                    if bc.bctop == FLUX:
                        grad = -bc.top / self.boundary.viscs["th"]
                    top_grad_th = float(grad)
        from .ops.pallas_fused import FusedLES2, HALO_J
        if self.mesh is not None:
            # Sharded fused path: per-shard kernels on halo-padded planes
            # inside shard_map (parallel/halo.py); the XLA wall patches stay
            # on global arrays.  Ghost-fold off (the global ghost fill's
            # rolls become GSPMD collectives on their own).
            from .parallel.halo import HALO
            npy = self.mesh.shape.get("y", 1)
            npx = self.mesh.shape.get("x", 1)
            if ctx.jtot % npy or ctx.itot % npx:
                return None
            jl = ctx.jtot // npy + 2 * HALO
            il = ctx.itot // npx + 2 * HALO
            plane_l = jl * il * np.dtype(self.dtype).itemsize
            # ~19 operand planes double-buffered must fit the (raised)
            # 100 MB scoped-vmem budget; this admits 512^2+halo shards
            # (41 MB).  No tiled fallback exists per shard, so beyond the
            # cap the XLA op pipeline takes over.
            if plane_l * 40 > 90 * 1024 * 1024:
                return None  # shard too large for the full-plane variant
            import copy
            ctx_l = copy.copy(ctx)
            ctx_l.jtot, ctx_l.itot = jl, il
            fused = FusedLES2(ctx_l, self.diff, self.thermo, has_thermo,
                              interpret=interpret, buffer=fold_buffer,
                              force=fold_force)
            fused.sharded_mesh = self.mesh
            return fused
        # VMEM budget: ~19 operand planes double-buffered in the full-plane
        # variant.  Larger planes switch to the j-tiled manual-DMA variant.
        # MICROHH_FUSED_VARIANT=plane/tiled forces one (the raised
        # per-kernel vmem cap in pallas_fused admits full 512^2 planes).
        variant = os.environ.get("MICROHH_FUSED_VARIANT", "")
        plane = ctx.jtot * ctx.itot * np.dtype(self.dtype).itemsize
        if variant != "tiled" and (variant == "plane"
                                   or plane * 40 <= 14 * 1024 * 1024):
            return FusedLES2(ctx, self.diff, self.thermo, has_thermo,
                             interpret=interpret, buffer=fold_buffer,
                             force=fold_force, fold_ghosts=fold_ghosts,
                             top_grad_th=top_grad_th)
        # pick the largest tile height <= 128 that divides jtot
        tj = None
        for cand in (128, 64, 32, 16, 8):
            if cand >= HALO_J and ctx.jtot % cand == 0:
                tj = cand
                break
        if tj is None:
            return None
        row = ctx.itot * np.dtype(self.dtype).itemsize
        # 15 windows, double-buffered, plus four output blocks.  The 7 MB
        # bound matched the old 16 MB default scoped-vmem cap (the "Mosaic
        # crash" at tj=128/itot=512 was that limit); with the raised cap
        # MICROHH_TJ can push the tile height up.
        tj_env = os.environ.get("MICROHH_TJ")
        if tj_env:
            tj = int(tj_env)
        else:
            while tj >= 8 and (30 * (tj + 2 * HALO_J) * row + 4 * tj * row
                               > 7 * 1024 * 1024):
                tj //= 2
        if tj < 8 or ctx.jtot % tj != 0:
            return None
        return FusedLES2(ctx, self.diff, self.thermo, has_thermo,
                         interpret=interpret, tiled=True, tj=tj,
                         buffer=fold_buffer, force=fold_force,
                         fold_ghosts=fold_ghosts, top_grad_th=top_grad_th)

    def _maybe_build_o4_fused(self):
        """Fused advec_4 + diff_4 Pallas producer for the 4th-order stack
        (ops/o4_pallas) — replaces the two XLA op pipelines in the plain
        substep branch when the config matches."""
        if os.environ.get("MICROHH_O4_FUSED", "1") != "1":
            return None
        if getattr(self, "force_fused", None) is False:
            return None
        ctx = self.ctx
        from .ops.advec_4 import Advec4
        from .ops.advec_4m import Advec4m
        from .ops.diff_4 import Diff4
        if type(self.advec) is Advec4:
            scheme = "4"
        elif type(self.advec) is Advec4m:
            scheme = "4m"
        else:
            return None
        if not (ctx.spatial_order == 4 and type(self.diff) is Diff4
                and ctx.jtot > 1):
            return None
        if (np.dtype(self.dtype) == np.float64
                and jax.default_backend() == "tpu"):
            return None  # Mosaic f64 (see _maybe_build_fused)
        interpret = jax.default_backend() != "tpu"
        if interpret and not getattr(self, "force_fused", False):
            return None
        mesh = self.mesh
        from .ops.advec_interp_pallas import ADV_HALO
        npy = mesh.shape.get("y", 1) if mesh else 1
        npx = mesh.shape.get("x", 1) if mesh else 1
        if ctx.jtot % npy or ctx.itot % npx:
            return None
        jl, il = ctx.jtot // npy, ctx.itot // npx
        if mesh is not None:
            if min(jl, il) < 4 * ADV_HALO:
                return None
            jl, il = jl + 2 * ADV_HALO, il + 2 * ADV_HALO
        plane = jl * il * np.dtype(self.dtype).itemsize
        if plane * 70 > 90 << 20:
            return None  # momentum kernel: ~35 plane blocks double-buffered
        from .ops.o4_pallas import O4FusedPallas
        return O4FusedPallas(self.advec, self.diff, ctx, self.dtype,
                             interpret=interpret, mesh=mesh,
                             jtot_global=ctx.jtot, scheme=scheme)

    def _maybe_build_fused_generic(self, ctx):
        """Fused kernels for any thermo (N2 computed in XLA) and any scalar
        list: per-field uv/w/scalar passes + the evisc_n2 kernel.  Covers
        the moist/vapor/buoy LES hot paths (bomex, rico, SBL_Smag, ...)."""
        import jax as _jax
        from .ops.pallas_fused import FusedLES2
        interpret = _jax.default_backend() != "tpu"
        if (np.dtype(self.dtype) == np.float64
                and _jax.default_backend() == "tpu"):
            return None  # Mosaic f64 (see _maybe_build_fused)
        if interpret and not getattr(self, "force_fused", False):
            return None
        if not getattr(self.diff, "surface", False):
            return None  # wall patches assume the MO surface layer
        if ctx.scalar_names and not hasattr(self.thermo, "get_n2"):
            return None
        # every scalar needs a surface flux plane for the wall patch
        if not getattr(self.boundary, "is_surface", False):
            return None
        from .ops.force import Force
        fold_force = None
        if (isinstance(self.force, Force) and self.force.swlspres == "geo"
                and not self.force.tdep_geo
                and self.force.swls == "0" and self.force.swwls == "0"
                and self.force.swnudge == "0"):
            fold_force = self.force
        ctx_k = ctx
        mesh = None
        if self.mesh is not None:
            # per-shard kernels on halo-padded planes (parallel/halo.py)
            from .parallel.halo import HALO
            npy = self.mesh.shape.get("y", 1)
            npx = self.mesh.shape.get("x", 1)
            if ctx.jtot % npy or ctx.itot % npx:
                return None
            import copy
            ctx_k = copy.copy(ctx)
            ctx_k.jtot = ctx.jtot // npy + 2 * HALO
            ctx_k.itot = ctx.itot // npx + 2 * HALO
            mesh = self.mesh
        # largest generic (rk) kernel holds ~17 plane blocks double-
        # buffered; the raised 100 MB scoped-vmem cap (_pallas_call)
        # admits full 512^2 planes like the specialized path
        plane = ctx_k.jtot * ctx_k.itot * np.dtype(self.dtype).itemsize
        if plane * 40 > 90 * 1024 * 1024:
            return None
        self._skip_buffer = False
        self._skip_force = fold_force is not None
        fused = FusedLES2(ctx_k, self.diff, self.thermo, False,
                          interpret=interpret, force=fold_force)
        fused.generic = True
        fused.sharded_mesh = mesh
        # moist/vapor N2 is a pure thl vertical gradient against thvref
        # (thermo_moist.get_n2): fold it INTO the evisc kernel, killing
        # the XLA get_n2 pass and its HBM intermediate.  Buoy's +n2
        # background offset keeps the evisc_n2 path.
        from .ops.pallas_fused import C_THREFH
        from .ops.thermo_moist import ThermoMoist
        if isinstance(self.thermo, ThermoMoist):
            ks, ke = ctx.ks, ctx.ke
            fused.cc_evisc[:, C_THREFH] = np.asarray(
                self.thermo.thvref)[ks:ke]
            fused.n2_scalar = "thl"
        return fused

    # ------------------------------------------------------------------
    #  device-side chunked time loop (production analogue of the
    #  reference's tight C++ iteration loop, model.cxx:312-520): between
    #  two io/stats/save events the whole adaptive-dt loop runs on device
    #  in ONE dispatch (lax.while_loop), eliminating the per-step
    #  host<->device round trips (~2-3 ms each through a remote chip).
    # ------------------------------------------------------------------
    def _chunk_supported(self):
        """Chunking preserves exact event times (the final step's dt is
        clamped to land on the host-computed integer-time horizon), but
        per-STEP host work is impossible inside it — so any active
        time-dependent BC/forcing falls back to the per-step loop."""
        return (os.environ.get("MICROHH_CHUNK", "1") != "0"
                and self.timeloop.adaptivestep
                and self.sim_mode != "post"
                and not self.btimedep.items
                and not getattr(self.force, "tdep_ls", None)
                and not getattr(self.source, "tdep", None)
                and not self.sbot2d.swtimedep)

    _chunk_fn = None

    def build_chunk(self):
        if self._chunk_fn is not None:
            return
        tl = self.timeloop
        dty = self.dtype
        step = self._step_raw
        limits = self._limits_raw
        cflmax = float(getattr(self.advec, "cflmax", 1.0))
        cflmin = float(getattr(self.advec, "cflmin", 1.e-5))
        dnmax = getattr(self.diff, "dnmax", None)
        mcflmax = float(getattr(self.micro, "cflmax", 1.2))
        dtmax = float(tl.dtmax)

        def next_dt(lim, dt_prev, remaining):
            # Mirrors the host formulas in run(): the new dt is derived
            # from the PREVIOUS dt and the limit rates (timeloop.cxx
            # integer arithmetic collapses to these ratios).
            dt = jnp.asarray(dtmax, dty)
            if "cfl_rate" in lim:
                cfl = jnp.maximum(lim["cfl_rate"] * dt_prev, cflmin)
                dt = jnp.minimum(dt, dt_prev * cflmax / cfl)
            if dnmax is not None and "dn_rate" in lim:
                dn = lim["dn_rate"] * dt_prev
                dt = jnp.minimum(dt, jnp.where(
                    dn > 0., dt_prev * dnmax / jnp.maximum(dn, 1e-30),
                    jnp.asarray(np.inf, dty)))
            if "micro_rate" in lim:
                mc = jnp.maximum(lim["micro_rate"] * dt_prev, 1e-5)
                dt = jnp.minimum(dt, dt_prev * mcflmax / mc)
            last = remaining <= dt
            return jnp.where(last, remaining, dt), last

        def chunk(s, sfc, pp, dt0, t_h, t_start, nmax):
            _, _, aux_sd = jax.eval_shape(step, s, sfc, pp, dt0, t_start)
            aux0 = jax.tree_util.tree_map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), aux_sd)
            zero = jnp.zeros((), dty)

            def cond(c):
                return jnp.logical_and(~c["done"], c["n"] < nmax)

            def body(c):
                lim = limits(c["s"], c["sfc"])
                remaining = t_h - (c["tau"] + c["comp"])
                dt, last = next_dt(lim, c["dt"], remaining)
                s2, sfc2, aux = step(c["s"], c["sfc"], pp, dt,
                                     t_start + c["tau"])
                # Kahan-compensated time accumulation: the chunk must hit
                # t_h exactly even after thousands of f32 additions.
                y = dt - c["comp"]
                tau = c["tau"] + y
                comp = (tau - c["tau"]) - y
                return dict(s=s2, sfc=sfc2, aux=aux, tau=tau, comp=comp,
                            dt=dt, n=c["n"] + 1, done=last)

            c = jax.lax.while_loop(cond, body, dict(
                s=s, sfc=sfc, aux=aux0, tau=zero, comp=zero, dt=dt0,
                n=jnp.zeros((), jnp.int32),
                done=jnp.zeros((), jnp.bool_)))
            # rates of the FINAL state: the status line and the next
            # chunk's first dt derive from them, like the host loop.
            lim = limits(c["s"], c["sfc"])
            return (c["s"], c["sfc"], c["aux"], c["tau"], c["n"], c["dt"],
                    c["done"], lim)

        self._chunk_fn = jax.jit(chunk, donate_argnums=(0, 1))

    def _chunk_horizon(self, at_wall_limit):
        """Integer time to the nearest io/stats/save/end event."""
        tl = self.timeloop
        ih = tl.idtmax * max(tl.outputiter, 1) * 100  # fallback bound
        if at_wall_limit:
            ih = min(ih, tl.iiotimeprec - tl.itime % tl.iiotimeprec)
        ih = min(ih, tl.isavetime - tl.itime % tl.isavetime)
        if tl.itime < tl.iendtime:
            ih = min(ih, tl.iendtime - tl.itime)
        if self.stats is not None:
            ih = min(ih, self.stats.isampletime
                     - tl.itime % self.stats.isampletime)
        for comp in (self.cross, self.dump, self.column):
            if comp is not None and getattr(comp, "sw", False):
                ih = min(ih, comp.isampletime - tl.itime % comp.isampletime)
        return ih

    def _run_chunked(self, status_file):
        """Event-driven outer loop around the device chunk."""
        from .timeloop import IFACTOR
        tl = self.timeloop
        s, t, sfc = self.as_device_state(self.load_state())
        sfc = self.sbot2d.apply_static(self, sfc)
        self.build_step()
        self.build_chunk()

        lim = {k: float(v) for k, v in self._limits_fn(s, sfc).items()}
        first = True
        while True:
            cfl = lim.get("cfl_rate", 0.) * tl.dt
            dn = lim.get("dn_rate", 0.) * tl.dt
            if tl.do_check():
                self.print_status(s, sfc, cfl, dn, status_file)
            if tl.is_stats_step():
                if self.stats is not None:
                    self.stats.maybe_exec(self, s, t, sfc)
                if self.cross is not None and self.cross.do_cross(tl.itime):
                    self.cross.exec(s, getattr(self, "_last_aux", None),
                                    tl.iotime, sfc)
                if self.dump is not None and self.dump.do_dump(tl.itime):
                    self.dump.exec(s, getattr(self, "_last_aux", None),
                                   tl.iotime)
                if self.column is not None and self.column.do_column(tl.itime):
                    self.column.exec(s, tl.time, sfc)
            if (not first and tl.do_save(self.at_wall_clock_limit())
                    and tl.iteration != 0):
                self._last_sfc = sfc
                self.save_restart(s)
            first = False
            if tl.is_finished():
                break

            at_wall = self.at_wall_clock_limit()
            ih = self._chunk_horizon(at_wall)
            nmax = 1 << 30
            if tl.outputiter > 0:
                nmax = tl.outputiter - tl.iteration % tl.outputiter
            s, sfc, aux, tau, n, dt_dev, done, lim_dev = self._chunk_fn(
                s, sfc, self.pres_params,
                jnp.asarray(tl.dt, self.dtype),
                jnp.asarray(ih / IFACTOR, self.dtype),
                jnp.asarray(tl.time, self.dtype),
                jnp.asarray(nmax, jnp.int32))
            n = int(n)
            if n == 0:
                raise RuntimeError("chunk made no progress (dt underflow?)")
            self._last_aux = aux
            self._last_sfc = sfc
            tl.iteration += n
            if bool(done):
                tl.itime += ih       # exact: the last dt was clamped
            else:
                tl.itime += int(round(float(tau) * IFACTOR))
            tl.time = tl.itime / IFACTOR
            tl.idt = max(int(round(float(dt_dev) * IFACTOR)), 1)
            tl.dt = tl.idt / IFACTOR
            tl.iotime = tl.itime // tl.iiotimeprec
            if tl.itime >= tl.iendtime:
                tl.loop = False
            lim = {k: float(v) for k, v in lim_dev.items()}

        self.final_sfc = sfc
        return s, t

    # ------------------------------------------------------------------
    #  run mode
    # ------------------------------------------------------------------
    def load_state(self):
        tl = self.timeloop
        iotime = int(tl.istarttime // tl.iiotimeprec)
        tl.load(iotime, self.workdir)
        state_np = self.fields.load(iotime, self.workdir, dtype=self.dtype)
        return state_np

    def as_device_state(self, state_np):
        s = {n: jnp.asarray(state_np[n], dtype=self.dtype)
             for n in self.fields.all_prognostic_names}
        t = {n: jnp.zeros_like(s[n]) for n in self.fields.all_prognostic_names}
        if getattr(self.boundary, "is_surface", False):
            sfc_np = self.boundary.init_surface_state(dtype=self.dtype)
            if self.sim_mode != "init":
                tl = self.timeloop
                iotime = int(tl.itime // tl.iiotimeprec)
                sfc_np = self.boundary.load(sfc_np, iotime, self.workdir,
                                            dtype=self.dtype)
            sfc = {k: jnp.asarray(v, dtype=self.dtype) for k, v in sfc_np.items()}
        else:
            sfc = {}
        if hasattr(self.radiation, "init_state"):
            sfc_np = self.radiation.init_state({}, self.ctx, self.dtype)
            for k, v in sfc_np.items():
                sfc[k] = jnp.asarray(v, dtype=self.dtype)
        return s, t, sfc

    def save_restart(self, s):
        tl = self.timeloop
        iotime = int(tl.iotime)
        from .parallel import shard_io
        if not shard_io.state_is_addressable(s):
            # Multi-host: every process writes its own shard rectangles
            # into the shared reference-layout files (field3d_io.cxx
            # subarray-write semantics); small metadata from process 0.
            self.fields.save_sharded(s, iotime, self.workdir)
            if jax.process_index() == 0:
                if (getattr(self.boundary, "is_surface", False)
                        and self._last_sfc is not None):
                    self.boundary.save(
                        {k: shard_io.local_np(v)
                         for k, v in self._last_sfc.items()},
                        iotime, self.workdir)
                tl.save(iotime, self.workdir)
            return
        state_np = {n: np.asarray(s[n]) for n in self.fields.all_prognostic_names}
        self.fields.save(state_np, iotime, self.workdir)
        if getattr(self.boundary, "is_surface", False) and self._last_sfc is not None:
            self.boundary.save({k: np.asarray(v) for k, v in self._last_sfc.items()},
                               iotime, self.workdir)
        tl.save(iotime, self.workdir)

    def _status_path(self):
        return os.path.join(self.workdir, "%s.out" % (self.casename or "run"))

    def print_status(self, s, sfc, cfl, dn, status_file):
        tl = self.timeloop
        d = {k: float(v) for k, v in self._diag_fn(s, sfc).items()}
        now = _time.time()
        cpudt = now - self._last_wallclock
        self._last_wallclock = now
        line = ("%8d %11.3E %10.4f %11.3E %8.4f %8.4f %11.3E %16.8E %16.8E %16.8E\n"
                % (tl.iteration, tl.time, cpudt, tl.dt, cfl, dn,
                   d["div"], d["mom"], d["tke"], d["mass"]))
        status_file.write(line)
        status_file.flush()
        if not np.isfinite(cfl):
            raise RuntimeError("Simulation has non-finite numbers")
        return d

    def run(self, max_iters=None):
        tl = self.timeloop
        if (max_iters is None and self._chunk_supported()
                and os.environ.get("MICROHH_PROFILE") is None):
            status_file = open(self._status_path(), "a")
            status_file.write(
                "%8s %11s %10s %11s %8s %8s %11s %16s %16s %16s\n"
                % ("ITER", "TIME", "CPUDT", "DT", "CFL", "DNUM",
                   "DIV", "MOM", "TKE", "MASS"))
            try:
                return self._run_chunked(status_file)
            finally:
                status_file.close()
                from .utils import fastio
                fastio.flush()
        state_np = self.load_state()
        s, t, sfc = self.as_device_state(state_np)
        sfc = self.sbot2d.apply_static(self, sfc)
        self.build_step()

        cflmax = getattr(self.advec, "cflmax", 1.0)
        cflmin = getattr(self.advec, "cflmin", 1.e-5)
        dnmax = getattr(self.diff, "dnmax", None)

        status_file = open(self._status_path(), "a")
        status_file.write("%8s %11s %10s %11s %8s %8s %11s %16s %16s %16s\n"
                          % ("ITER", "TIME", "CPUDT", "DT", "CFL", "DNUM",
                             "DIV", "MOM", "TKE", "MASS"))
        # Opt-in profiling (SURVEY §5.1): MICROHH_PROFILE=<dir> captures a
        # jax-profiler trace of MICROHH_PROFILE_STEPS steps (default 5),
        # starting after the compile/warmup iterations.
        prof_dir = os.environ.get("MICROHH_PROFILE")
        prof_nsteps = int(os.environ.get("MICROHH_PROFILE_STEPS", "5"))
        prof_start, prof_active = 3, False
        niter = 0
        while True:
            # Time-dependent BCs/forcings (model.cxx:339-343).
            if self.btimedep.items:
                sfc = self.btimedep.update(self, sfc, tl.itime)
            if getattr(self.force, "has_timedep", False):
                sfc = self.force.update_timedep(sfc, tl.itime)
            if getattr(self.thermo, "tdep_pbot", None) is not None:
                sfc = self.thermo.update_timedep(sfc, tl.itime)
            if self.grid_tdep:
                sfc = dict(sfc)
                sfc["__lat"] = jnp.asarray(
                    float(self.grid_tdep["lat"].interpolate(tl.itime)))
                sfc["__lon"] = jnp.asarray(
                    float(self.grid_tdep["lon"].interpolate(tl.itime)))
            if getattr(self.source, "tdep", None):
                sfc = self.source.update_timedep(sfc, tl.itime)
            if self.sbot2d.swtimedep:
                sfc = self.sbot2d.update(self, sfc, tl.itime)

            # Adaptive time step (model.cxx:730-751).
            tl.reset_time_step_limit(self.at_wall_clock_limit())
            if self.stats is not None:
                # Align steps with the sampling time (stats get_time_limit).
                tl.set_time_step_limit(
                    self.stats.isampletime - tl.itime % self.stats.isampletime)
            for comp in (self.cross, self.dump, self.column):
                if comp is not None and getattr(comp, "sw", False):
                    tl.set_time_step_limit(
                        comp.isampletime - tl.itime % comp.isampletime)
            lim = {k: float(v) for k, v in self._limits_fn(s, sfc).items()}
            cfl = lim.get("cfl_rate", 0.) * tl.dt
            dn = lim.get("dn_rate", 0.) * tl.dt
            if "cfl_rate" in lim:
                cfl_eff = max(cfl, cflmin)
                tl.set_time_step_limit(tl.idt * cflmax / cfl_eff)
            if dnmax is not None and dn > 0.:
                tl.set_time_step_limit(tl.idt * dnmax / dn)
            if "micro_rate" in lim:
                micro_cfl = max(lim["micro_rate"] * tl.dt, 1e-5)
                tl.set_time_step_limit(tl.idt * self.micro.cflmax / micro_cfl)
            tl.set_time_step()

            if tl.do_check():
                self.print_status(s, sfc, cfl, dn, status_file)

            if tl.is_stats_step():
                if self.stats is not None:
                    self.stats.maybe_exec(self, s, t, sfc)
                if self.cross is not None and self.cross.do_cross(tl.itime):
                    self.cross.exec(s, getattr(self, "_last_aux", None), tl.iotime, sfc)
                if self.dump is not None and self.dump.do_dump(tl.itime):
                    self.dump.exec(s, getattr(self, "_last_aux", None), tl.iotime)
                if self.column is not None and self.column.do_column(tl.itime):
                    self.column.exec(s, tl.time, sfc)

            if tl.is_finished():
                break

            if prof_dir is not None:
                if niter == prof_start:
                    jax.profiler.start_trace(prof_dir)
                    prof_active = True
                elif prof_active and niter == prof_start + prof_nsteps:
                    jax.block_until_ready(s["u"])
                    jax.profiler.stop_trace()
                    prof_active = False

            dt_dev = jnp.asarray(tl.dt, dtype=self.dtype)
            time_dev = jnp.asarray(tl.time, dtype=self.dtype)
            s, sfc, _aux = self._step_fn(s, sfc, self.pres_params,
                                         dt_dev, time_dev)
            self._last_aux = _aux
            self._last_sfc = sfc
            tl.step_time()

            if tl.do_save(self.at_wall_clock_limit()):
                self.save_restart(s)

            niter += 1
            if max_iters is not None and niter >= max_iters:
                break

        if prof_active:
            jax.block_until_ready(s["u"])
            jax.profiler.stop_trace()
        status_file.close()
        from .utils import fastio
        fastio.flush()  # all async restart writes must land before we return
        self.final_sfc = sfc
        return s, t

    # ------------------------------------------------------------------
    #  post-processing mode (reference model.cxx:523-543): re-read restart
    #  files and re-run the diagnostics blocks, no time integration.
    # ------------------------------------------------------------------
    def post(self):
        tl = self.timeloop
        self.build_step()
        ctx = self.ctx

        # Post mode re-diagnoses surface state and aux fields from the
        # loaded prognostics, like the reference which runs the full
        # boundary/diffusion diagnosis per saved time (model.cxx:523-543).
        # LSM surface state is loaded from its own restart files instead.
        def _rediagnose(s, sfc):
            s_g = self.boundary.set_ghost_cells(ctx, s, sfc)
            aux = self.diff.exec_viscosity(ctx, s_g, sfc, {})
            if getattr(self.boundary, "is_surface", False) and not getattr(
                    self.boundary, "is_lsm", False):
                sfc = self.boundary.exec(ctx, s_g, sfc, aux)
            return sfc, aux

        rediagnose = jax.jit(_rediagnose)
        while True:
            iotime = int(tl.iotime)
            tl.load(iotime, self.workdir)
            state_np = self.fields.load(iotime, self.workdir, dtype=self.dtype)
            s, t, sfc = self.as_device_state(state_np)
            sfc, aux = rediagnose(s, sfc)
            if self.stats is not None and self.stats.do_statistics(tl.itime):
                self.stats.maybe_exec(self, s, t, sfc)
            if self.cross is not None and self.cross.do_cross(tl.itime):
                self.cross.exec(s, aux, iotime, sfc)
            if self.dump is not None and self.dump.do_dump(tl.itime):
                self.dump.exec(s, aux, iotime)
            if self.column is not None and self.column.do_column(tl.itime):
                self.column.exec(s, tl.time, sfc)
            tl.step_post_proc_time()
            if tl.is_finished():
                break


def run_case(case_dir, casename, mode, dtype=None):
    """CLI entry: microhh {init,run} casename (reference main/microhh.cxx)."""
    ini = Ini(os.path.join(case_dir, "%s.ini" % casename))
    model = Model(ini, mode, casename, workdir=case_dir, dtype=dtype)
    model.finish_setup()
    if mode == "init":
        # The reference constructs every component in init mode too, so the
        # same ini options are consumed regardless of mode; mirror that so
        # init never flags run-only options as unused.
        from .output import Cross, Dump, Column
        from .stats import Stats
        Cross(model)
        Dump(model)
        Column.consume_options(model.ini)
        Stats.consume_options(model.ini)
        model.save_initial_state()
    elif mode in ("run", "post"):
        from .output import Cross, Dump, Column
        if model.ini.get_int("stats", "swstats", default=0):
            from .stats import Stats
            model.stats = Stats(model)
        model.cross = Cross(model)
        model.dump = Dump(model)
        model.column = Column(model)
        if mode == "run":
            model.run()
        else:
            model.post()
        if model.stats is not None:
            model.stats.close()
        if model.column is not None:
            model.column.close()
    else:
        raise ValueError("unknown mode %s" % mode)
    unused = model.ini.unused_items()
    if unused:
        print("WARNING unused ini options:", ", ".join(
            "[%s] %s%s" % (s, i, "[%s]" % su if su else "") for s, i, su in unused))
    return model
