"""Version triple consistency — the test-side half of the release
machinery (reference: version-bump checks in pr-validation.yml /
version-release.yml): VERSION, pyproject.toml, and cfd_tpu.__version__
must agree, be semver, and have a CHANGELOG entry."""

import pathlib
import re

import cfd_tpu

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_version_triple_consistent():
    version = (ROOT / "VERSION").read_text().strip()
    assert re.fullmatch(r"\d+\.\d+\.\d+", version), version
    assert cfd_tpu.__version__ == version
    assert f'version = "{version}"' in (ROOT / "pyproject.toml").read_text()


def test_changelog_has_current_entry():
    version = (ROOT / "VERSION").read_text().strip()
    assert f"## [{version}]" in (ROOT / "CHANGELOG.md").read_text()
