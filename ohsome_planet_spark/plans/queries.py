"""Query/oracle registry for the driver contract — now a thin
re-export over six mechanical line-range slices (_q01.._q06, chained
namespaces over plans/_qshared.py which owns QUERIES/ORACLES/_register).
The public surface is unchanged: every name importable from this module
before the split (including underscore helpers used by tests) still is.
"""

from ._q06 import *  # noqa: F401,F403 — cumulative: includes _q01.._q05 + _qshared
