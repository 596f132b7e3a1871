"""Back-compat shim: the fixture encoder moved into the package
(``ohsome_planet_spark/sources/pbf_encoder.py``) so registry queries can
build deterministic ``.osh.pbf`` fixtures (``contrib_from_pbf``)."""

from ohsome_planet_spark.sources.pbf_encoder import *  # noqa: F401,F403
from ohsome_planet_spark.sources.pbf_encoder import (  # noqa: F401
    _MTYPE,
    _write_blob,
)
