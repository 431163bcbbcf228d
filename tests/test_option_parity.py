"""Ini-option parity sweep vs the reference sources.

Extracts every (group, item) the reference reads through
``get_item``/``get_list`` and checks each is read HERE through the
config system: the pair must appear inside an actual ``ini.get_*()``
call site (``get_bool/int/float/str/item/list``), not merely as two
adjacent string literals anywhere in the package (a comment or an
unrelated tuple does not count).  Options read through indirection
(a helper that closes over the group name) are verified against the
helper's own call sites in the file that owns them.  Runs only when
the reference checkout is present.
"""

import glob
import os
import re

import pytest

REF = "/root/reference"
PKG = os.path.join(os.path.dirname(__file__), "..", "microhh_tpu")

# Options consumed via a group-closing helper, so no direct
# ini.get_*("group", "item") call site exists.  Maps (group, item) ->
# (file owning the helper, regex the item must match inside that file).
# ops/source.py: `def getlist(name): return ini.get_list(float,
# "source", name)` called as getlist("source_x0") etc.
INDIRECT = {
    ("source", it): ("ops/source.py", r'getlist\(\s*["\']%s["\']\s*\)' % it)
    for it in ("source_x0", "source_y0", "source_z0",
               "sigma_x", "sigma_y", "sigma_z", "strength")
}

# an actual config read: ini.get_bool("grp", "item"...) or
# ini.get_list(typ, "grp", "item"...) / get_item(typ, "grp", "item"...)
CALL_RE = re.compile(
    r'get_(?:bool|int|float|str|item|list)\(\s*(?:[A-Za-z_][\w.]*\s*,\s*)?'
    r'["\']([a-z0-9_]+)["\']\s*,\s*["\']([a-z0-9_]+)["\']')


def _scrape_reference():
    ref = set()
    for f in (glob.glob(os.path.join(REF, "src", "*.cxx"))
              + glob.glob(os.path.join(REF, "include", "*.h"))
              + glob.glob(os.path.join(REF, "main", "*.cxx"))):
        txt = open(f, errors="ignore").read()
        for m in re.finditer(
                r'get_(?:item|list)<[^>]*>\(\s*"([a-z0-9_]+)"\s*,'
                r'\s*"([a-z0-9_]+)"', txt):
            ref.add((m.group(1), m.group(2)))
    return ref


def _scrape_ours():
    ours = set()
    for f in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        txt = open(f, errors="ignore").read()
        for m in CALL_RE.finditer(txt):
            ours.add((m.group(1), m.group(2)))
    return ours


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_all_reference_options_are_handled():
    ref = _scrape_reference()
    assert len(ref) > 150  # sanity: the scrape found the real option set

    ours = _scrape_ours()

    missing = []
    for gi in sorted(ref):
        if gi in ours:
            continue
        if gi in INDIRECT:
            fname, pat = INDIRECT[gi]
            txt = open(os.path.join(PKG, fname)).read()
            if re.search(pat, txt):
                continue
        missing.append(gi)
    assert not missing, "unhandled reference options: %s" % missing


def test_scrape_rejects_non_callsite_pairs():
    """The package scrape must NOT count a bare string pair (comment,
    tuple, dict key) as a handled option — only real ini.get_* calls."""
    assert not CALL_RE.search('x = ("boundary", "swtimedep")')
    assert not CALL_RE.search('# reads "force", "fc" from the ini')
    assert CALL_RE.search('ini.get_float("force", "fc", default=0.)')
    assert CALL_RE.search('ini.get_list(str, "force", "lslist")')
    assert CALL_RE.search("ini.get_item(float, 'fields', 'rndamp', sub)")
