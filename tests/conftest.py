import json
import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

#: Conformance fixtures are vendored in-repo (SURVEY §5.2) so the suite is
#: self-contained; FRANKENSEARCH_REF_FIXTURES can point at a reference
#: checkout to cross-check against upstream copies instead.
VENDORED_FIXTURES = Path(__file__).resolve().parent / "fixtures"
REFERENCE_FIXTURES = Path(
    os.environ.get("FRANKENSEARCH_REF_FIXTURES", "/root/reference/tests/fixtures")
)


def load_reference_fixture(name: str):
    for root in (VENDORED_FIXTURES, REFERENCE_FIXTURES):
        path = root / name
        if path.exists():
            return json.loads(path.read_text())
    pytest.skip(f"fixture {name} not available (vendored or reference)")


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
def relevance_fixture():
    return load_reference_fixture("relevance.json")


@pytest.fixture(scope="session")
def spark():
    from frankensearch_spark.session import get_spark

    spark = get_spark(app_name="frankensearch-tests", cores=4, shuffle_partitions=8)
    yield spark
