"""Custom Python Data Source API connectors (Spark 4)."""

from .pyds import FixtureReplaySource, register_fixture_replay

__all__ = ["FixtureReplaySource", "register_fixture_replay"]
