"""Ini-option parity sweep vs the reference sources.

Extracts every (group, item) the reference reads through
``get_item``/``get_list`` and checks each appears as a literal pair
somewhere in this package.  Options read through indirection (a helper
that closes over the group name) are allowlisted with the file that
handles them.  Runs only when the reference checkout is present.
"""

import glob
import os
import re

import pytest

REF = "/root/reference"

# options consumed via helpers, so no literal (group, item) pair exists
ALLOW = {
    ("master", "npx"),    # parallel/mesh.py builds the mesh from [master]
    ("master", "npy"),
    ("source", "source_x0"),  # ops/source.py getlist("source_x0") etc.
    ("source", "source_y0"),
    ("source", "source_z0"),
    ("source", "sigma_x"),
    ("source", "sigma_y"),
    ("source", "sigma_z"),
    ("source", "strength"),
}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_all_reference_options_are_handled():
    ref = set()
    for f in (glob.glob(os.path.join(REF, "src", "*.cxx"))
              + glob.glob(os.path.join(REF, "include", "*.h"))
              + glob.glob(os.path.join(REF, "main", "*.cxx"))):
        txt = open(f, errors="ignore").read()
        for m in re.finditer(
                r'get_(?:item|list)<[^>]*>\(\s*"([a-z0-9_]+)"\s*,'
                r'\s*"([a-z0-9_]+)"', txt):
            ref.add((m.group(1), m.group(2)))
    assert len(ref) > 150  # sanity: the scrape found the real option set

    pkg = os.path.join(os.path.dirname(__file__), "..", "microhh_tpu")
    ours = set()
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        txt = open(f, errors="ignore").read()
        for m in re.finditer(
                r'["\']([a-z0-9_]+)["\']\s*,\s*["\']([a-z0-9_]+)["\']', txt):
            ours.add((m.group(1), m.group(2)))

    missing = sorted(gi for gi in ref if gi not in ours and gi not in ALLOW)
    assert not missing, "unhandled reference options: %s" % missing
