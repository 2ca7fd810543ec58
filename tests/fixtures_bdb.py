"""Deterministic synthetic BDB tables (FIXTURES.md conventions):
10 Hz frames, field bounds 0-120 x 0-53.3, exactly 11 defenders +
5 route runners + 1 QB + 1 football row per frame, events ordered
line_set < ball_snap (gap > 2 s) < pass_forward (+7 ball frames) <
pass_arrived."""

from __future__ import annotations

import math

from bigdatabowl2024_25_spark import schemas

ROUTES = ["GO", "SLANT", "OUT", "IN", "POST"]
COVERAGES = ["Cover-3", "2-Man", "Quarters"]
ASSIGNMENTS = ["MAN", "HOL", "3L", "3M", "3R"]

N_FRAMES = 40  # 4 s of tracking per play
SNAP_FRAME = 25  # line_set at 1, ball_snap at 25 (2.4 s gap)
PASS_FRAME = 32


def _time_str(frame: int) -> str:
    # 10 Hz wall clock with variable fraction digits (exercises F7 pad)
    frac = (frame % 10) * 100000
    sec = 10 + frame // 10
    if frac == 0:
        return f"2022-09-08 20:00:{sec:02d}"
    return f"2022-09-08 20:00:{sec:02d}.{frac // 100000}"


def build_fixtures(spark, n_games: int = 2, plays_per_game: int = 3):
    games, plays, players, player_play, tracking = [], [], [], [], []

    # 22 skaters + QB ids are per-team blocks; football has nflId None
    off_ids = [100 + i for i in range(6)]  # QB + 5 receivers
    def_ids = [200 + i for i in range(11)]
    for i, pid in enumerate(off_ids):
        players.append((pid, f"OFF_{i}", "QB" if i == 0 else "WR"))
    for i, pid in enumerate(def_ids):
        players.append((pid, f"DEF_{i}", "CB" if i < 6 else "S"))

    for g in range(n_games):
        game_id = 2022090800 + g
        games.append((game_id, "HOME", "AWAY", g + 1))
        for p in range(plays_per_game):
            play_id = 100 + p
            cov = COVERAGES[(g + p) % len(COVERAGES)]
            plays.append(
                (
                    game_id, play_id, "HOME", "AWAY", True, "TRADITIONAL",
                    1.0 + 0.5 * p, False, 2.0 + 0.3 * p, 35 + 5 * p, cov,
                    f"0{9 - p}:3{p}", 7 * g, 3 * p, 1 + p % 3, 10 - p,
                )
            )
            for i, pid in enumerate(off_ids):
                if i == 0:
                    player_play.append(
                        (game_id, play_id, pid, "HOME", False, None, None,
                         None, False, None)
                    )
                else:
                    player_play.append(
                        (
                            game_id, play_id, pid, "HOME", True,
                            ROUTES[(i + p) % len(ROUTES)],
                            200 + (i - 1), None,
                            i == 1 + (p % 5), bool(i % 2),
                        )
                    )
            for i, pid in enumerate(def_ids):
                player_play.append(
                    (
                        game_id, play_id, pid, "AWAY", False, None, None,
                        ASSIGNMENTS[i % len(ASSIGNMENTS)], False, None,
                    )
                )

            for f in range(1, N_FRAMES + 1):
                ftype = (
                    "BEFORE_SNAP" if f < SNAP_FRAME
                    else "SNAP" if f == SNAP_FRAME
                    else "AFTER_SNAP"
                )
                event = {
                    1: "line_set",
                    SNAP_FRAME: "ball_snap",
                    PASS_FRAME: "pass_forward",
                    N_FRAMES - 1: "pass_arrived",
                }.get(f)
                t = _time_str(f)

                def row(pid, name, jersey, club, x, y, s, a, d):
                    return (
                        game_id, play_id, pid, name, f, ftype, t, jersey,
                        club, "right",
                        max(0.0, min(120.0, x)), max(0.0, min(53.3, y)),
                        s, a, s * 0.1, (d + 90) % 360, d, event,
                    )

                # QB drops straight back
                tracking.append(
                    row(100, "OFF_0", 1, "HOME", 40.0 - 0.12 * f, 26.6,
                        1.5 + 0.01 * f, 0.5, 270.0)
                )
                # receivers fan out by lane
                for i in range(1, 6):
                    y0 = 5.0 + 9.0 * (i - 1) + 0.8 * p
                    tracking.append(
                        row(100 + i, f"OFF_{i}", 10 + i, "HOME",
                            42.0 + 0.45 * f + g, y0 + 0.1 * f * (1 if i % 2 else -1),
                            6.0 + 0.3 * i, 0.8, (i * 60.0) % 360)
                    )
                # defenders mirror receivers with a cushion
                for j in range(11):
                    y0 = 3.0 + 4.6 * j + 0.5 * g
                    tracking.append(
                        row(200 + j, f"DEF_{j}", 30 + j, "AWAY",
                            47.0 + 0.40 * f + p, y0 + 0.05 * f,
                            5.5 + 0.2 * (j % 4), 0.6, (j * 33.0) % 360)
                    )
                # football
                bx = 40.0 - 0.12 * f if f < PASS_FRAME else 40.0 + 1.8 * (f - PASS_FRAME)
                tracking.append(
                    (
                        game_id, play_id, None, "football", f, ftype, t, None,
                        "football", "right",
                        max(0.0, min(120.0, bx)), 26.6,
                        2.0 if f < PASS_FRAME else 19.0, 0.1, 0.2, 0.0, 90.0,
                        event,
                    )
                )

    return {
        "games": spark.createDataFrame(games, schemas.GAMES),
        "plays": spark.createDataFrame(plays, schemas.PLAYS),
        "players": spark.createDataFrame(players, schemas.PLAYERS),
        "player_play": spark.createDataFrame(player_play, schemas.PLAYER_PLAY),
        "tracking": spark.createDataFrame(tracking, schemas.TRACKING),
    }
