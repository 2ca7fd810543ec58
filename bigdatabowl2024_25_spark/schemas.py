"""Explicit StructTypes for the BDB star schema (FIXTURES.md A1-A5).

The reference infers schemas at every boundary (`read_csv`,
`dbWriteTable` affinity inference — SURVEY.md §1.4); here every
boundary is declared and fail-fast. Boolean-as-int columns become real
booleans at ingest; the tracking `time` string stays a string at scan
and is parsed once via `functions.scalar.pad_time_fraction` (F7).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name, t, nullable=True):
    return StructField(name, t, nullable)


GAMES = StructType(
    [
        _f("gameId", LongType(), False),
        _f("homeTeamAbbr", StringType()),
        _f("visitorTeamAbbr", StringType()),
        _f("week", IntegerType()),
    ]
)

PLAYS = StructType(
    [
        _f("gameId", LongType(), False),
        _f("playId", LongType(), False),
        _f("possessionTeam", StringType()),
        _f("defensiveTeam", StringType()),
        _f("isDropback", BooleanType()),
        _f("dropbackType", StringType()),
        _f("dropbackDistance", DoubleType()),
        _f("unblockedPressure", BooleanType()),
        _f("timeToThrow", DoubleType()),
        _f("absoluteYardlineNumber", IntegerType()),
        _f("pff_passCoverage", StringType()),
        _f("gameClock", StringType()),
        _f("preSnapHomeScore", IntegerType()),
        _f("preSnapVisitorScore", IntegerType()),
        _f("down", IntegerType()),
        _f("yardsToGo", IntegerType()),
    ]
)

PLAYERS = StructType(
    [
        _f("nflId", LongType(), False),
        _f("displayName", StringType()),
        _f("position", StringType()),
    ]
)

PLAYER_PLAY = StructType(
    [
        _f("gameId", LongType(), False),
        _f("playId", LongType(), False),
        _f("nflId", LongType(), False),
        _f("teamAbbr", StringType()),
        _f("wasRunningRoute", BooleanType()),
        _f("routeRan", StringType()),
        _f("pff_primaryDefensiveCoverageMatchupNflId", LongType()),
        _f("pff_defensiveCoverageAssignment", StringType()),
        _f("wasTargettedReceiver", BooleanType()),
        _f("motionSinceLineset", BooleanType()),
    ]
)

TRACKING = StructType(
    [
        _f("gameId", LongType(), False),
        _f("playId", LongType(), False),
        _f("nflId", LongType()),  # null for football rows
        _f("displayName", StringType()),
        _f("frameId", IntegerType(), False),
        _f("frameType", StringType()),
        _f("time", StringType()),
        _f("jerseyNumber", IntegerType()),
        _f("club", StringType()),
        _f("playDirection", StringType()),
        _f("x", DoubleType()),
        _f("y", DoubleType()),
        _f("s", DoubleType()),
        _f("a", DoubleType()),
        _f("dis", DoubleType()),
        _f("o", DoubleType()),
        _f("dir", DoubleType()),
        _f("event", StringType()),
    ]
)

BASE_TABLES = {
    "games": GAMES,
    "plays": PLAYS,
    "players": PLAYERS,
    "player_play": PLAYER_PLAY,
    "tracking": TRACKING,
}

#: declared key invariants (DatabaseCreation.R:60-73 — non-functional
#: there; executable here via sources.io.assert_unique_key)
PRIMARY_KEYS = {
    "games": ["gameId"],
    "plays": ["gameId", "playId"],
    "players": ["nflId"],
    "player_play": ["gameId", "playId", "nflId"],
    "tracking": ["gameId", "playId", "nflId", "frameId"],
}
