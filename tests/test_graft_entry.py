"""Driver-contract checks: the multichip sharding dry run executes on the virtual mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure
