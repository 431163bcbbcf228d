"""Thermodynamics base: disabled scheme (reference ``src/thermo_disabled.cxx``)."""


class ThermoDisabled:
    scalars = ()

    def __init__(self, *a, **k):
        pass

    def create_basestate(self, input_nc):
        pass

    def exec(self, ctx, s, t, aux):
        return t

    def get_buoyancy_fluxbot(self, ctx, s, aux):
        return None

    def get_n2(self, ctx, s, aux):
        return None

    def get_time_limit_rate(self, ctx, s):
        return None
