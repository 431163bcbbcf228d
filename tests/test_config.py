from microhh_tpu.config import Ini


INI = """
[grid]
itot=128
jtot=1   # trailing comment
ktot=64
xsize=1.

[fields]
rndamp=0.
rndamp[th]=0.1
slist=s1,s2

[boundary]
sbcbot=dirichlet
sbot[th]=0.25
"""


def test_basic_items():
    ini = Ini(INI)
    assert ini.get_int("grid", "itot") == 128
    assert ini.get_float("grid", "xsize") == 1.0
    assert ini.get_int("grid", "jtot") == 1


def test_subitem_fallback():
    ini = Ini(INI)
    # explicit subitem
    assert ini.get_float("fields", "rndamp", subitem="th") == 0.1
    # fallback to plain value for other fields
    assert ini.get_float("fields", "rndamp", subitem="qt") == 0.0
    assert ini.get_str("boundary", "sbcbot", subitem="s1") == "dirichlet"


def test_defaults_and_lists():
    ini = Ini(INI)
    assert ini.get_float("time", "dtmax", default=5.0) == 5.0
    assert ini.get_list(str, "fields", "slist") == ["s1", "s2"]
    assert ini.get_list(float, "fields", "nolist", default=[1.0]) == [1.0]


def test_used_tracking():
    ini = Ini(INI)
    ini.get_int("grid", "itot")
    unused = ini.unused_items()
    assert ("grid", "itot", "") not in unused
    assert ("grid", "ktot", "") in unused
