"""Driver entry-point regression test (dryrun on the virtual 8-device mesh)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as g

    g.dryrun_multichip(5)
