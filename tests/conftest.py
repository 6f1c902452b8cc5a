import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from terraspark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session("terraspark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_tables():
    """Deterministic 8-image fixture set + its oracle (shared per session)."""
    from terraspark.fixtures import build_tables
    from terraspark.reference_model import OracleRun

    images, scenes, dem, aoi, grids = build_tables(8)
    oracle = OracleRun(8, images, scenes, grids, aoi)
    return images, scenes, dem, aoi, grids, oracle
