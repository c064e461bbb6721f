"""Regenerate the embedded ``--help`` block in README.md (cog equivalent).

The reference cog-syncs its CLI help into README.md and tests the sync
(/root/reference/README.md:114-187, tests/test_csvs_to_sqlite.py:769-778).
``cog`` is not available in this container, so this 30-line stand-in does
the same job: everything between the HELP_BEGIN/HELP_END markers is
replaced with the live ``--help`` output. ``tests/test_engine_golden.py::
test_readme_help_in_sync`` asserts README.md matches; run

    python tools/sync_readme_help.py

after changing any Click option to refresh it.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

HELP_BEGIN = "<!-- [[[help -->"
HELP_END = "<!-- help]]] -->"


def render_help_block() -> str:
    from click.testing import CliRunner

    from csvs_to_sqlite_spark.cli import cli

    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0, result.output
    help_text = result.output.replace(
        "Usage: cli", "Usage: python -m csvs_to_sqlite_spark.cli"
    )
    return "{}\n```\n{}\n```\n{}".format(HELP_BEGIN, help_text, HELP_END)


def sync(readme: pathlib.Path, write: bool = True) -> bool:
    """Returns True if README already in sync; rewrites it when not."""
    text = readme.read_text()
    start = text.index(HELP_BEGIN)
    end = text.index(HELP_END) + len(HELP_END)
    updated = text[:start] + render_help_block() + text[end:]
    if updated == text:
        return True
    if write:
        readme.write_text(updated)
    return False


if __name__ == "__main__":
    readme = pathlib.Path(__file__).resolve().parent.parent / "README.md"
    in_sync = sync(readme)
    print("README.md already in sync" if in_sync else "README.md help block rewritten")
    sys.exit(0)
