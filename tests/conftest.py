import json
import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_FIXTURES = Path(
    os.environ.get("FRANKENSEARCH_REF_FIXTURES", "/root/reference/tests/fixtures")
)


def load_reference_fixture(name: str):
    path = REFERENCE_FIXTURES / name
    if not path.exists():
        pytest.skip(f"reference fixture {name} not available at {path}")
    return json.loads(path.read_text())


@pytest.fixture(scope="session")
def contract_fixture():
    return load_reference_fixture("quill_language_contract.json")


@pytest.fixture(scope="session")
def corpus_fixture():
    return load_reference_fixture("corpus.json")


@pytest.fixture(scope="session")
def queries_fixture():
    return load_reference_fixture("queries.json")


@pytest.fixture(scope="session")
def spark():
    from frankensearch_spark.session import get_spark

    spark = get_spark(app_name="frankensearch-tests", cores=4, shuffle_partitions=8)
    yield spark
