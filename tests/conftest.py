from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def casd_endpoint():
    """One casd.py HTTP lock server for the whole session (the
    remote-shaped conditional-put arbiter); tests key on
    tmp_path-unique lock paths so state never crosses tests."""
    import subprocess
    import sys

    p = subprocess.Popen(
        [sys.executable, "-m", "local_datalakehouse_phase2_spark.lakehouse.casd"],
        stdout=subprocess.PIPE,
        text=True,
    )
    line = p.stdout.readline()
    assert line.startswith("CASD LISTENING "), line
    port = int(line.split()[-1])
    yield f"http://127.0.0.1:{port}"
    p.terminate()
    p.wait(timeout=10)
