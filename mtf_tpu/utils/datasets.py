"""Benchmark dataset registry.

Re-encodes the reference actor/sequence tables
(`/root/reference/Config/include/mtf/Config/datasets.h:6-929`) — pure data,
expressed via generators where the naming follows a pattern (TMT light x
object x speed; UCSB scene x motion). Sequences live on disk as
`<db_root>/<actor>/<sequence>/frame%05d.jpg` with GT at
`<db_root>/<actor>/<sequence>.txt` (objUtils.cc readGT conventions).
"""
from __future__ import annotations

_TMT_OBJECTS = ["bookI", "bookII", "bookIII", "cereal", "juice",
                "mugI", "mugII", "mugIII"]


def _tmt() -> list[str]:
    seqs = []
    for speed in ["s3", "s4"]:
        seqs += [f"nl_{o}_{speed}" for o in _TMT_OBJECTS]
    seqs += ["nl_bus", "nl_highlighting", "nl_letter", "nl_newspaper"]
    for speed in ["s1", "s2", "s5"]:
        seqs += [f"nl_{o}_{speed}" for o in _TMT_OBJECTS]
    seqs += [f"nl_{o}_si" for o in
             ["bookI", "bookII", "cereal", "juice", "mugI", "mugIII"]]
    for speed in ["s3", "s4"]:
        seqs += [f"dl_{o}_{speed}" for o in _TMT_OBJECTS]
    seqs += ["dl_bus", "dl_highlighting", "dl_letter", "dl_newspaper"]
    for speed in ["s1", "s2"]:
        seqs += [f"dl_{o}_{speed}" for o in _TMT_OBJECTS]
    seqs += [f"dl_{o}_s5" for o in
             ["bookI", "bookII", "bookIII", "cereal", "juice", "mugI",
              "mugIII"]]
    seqs += [f"dl_{o}_si" for o in
             ["bookII", "cereal", "juice", "mugI", "mugIII"]]
    seqs += ["dl_mugII_si", "dl_mugII_s5", "nl_mugII_si"]
    seqs += [f"robot_{o}" for o in _TMT_OBJECTS]
    return seqs


def _ucsb() -> list[str]:
    scenes = ["bricks", "building", "mission", "paris", "sunset", "wood"]
    motions = (["dynamic_lighting"] + [f"motion{i}" for i in range(1, 10)]
               + ["panning", "perspective", "rotation", "static_lighting",
                  "unconstrained", "zoom"])
    return [f"{s}_{m}" for s in scenes for m in motions]


SEQUENCES = {
    "TMT": _tmt(),
    "UCSB": _ucsb(),
    "LinTrack": ["mouse_pad", "phone", "towel"],
    "LinTrackShort": ([f"mouse_pad_{i}" for i in range(1, 8)]
                      + [f"phone_{i}" for i in range(1, 4)]
                      + [f"towel_{i}" for i in range(1, 5)]),
    "PAMI": ["acronis", "bass", "bear", "board_robot", "board_robot_2",
             "book1", "book2", "book3", "book4", "box", "box_robot",
             "cat_cylinder", "cat_mask", "cat_plane", "compact_disc", "cube",
             "dft_atlas_moving", "dft_atlas_still", "dft_moving", "dft_still",
             "juice", "lemming", "mascot", "omni_magazine", "omni_obelix",
             "sylvester", "table_top", "tea"],
    "TMT_FINE": [f"{task}_{view}" for task in
                 ["fish_lure", "key_task", "hexagon_task"] for view in
                 ["left", "right", "fast_left", "fast_right"]]
                + [f"{task}_{view}" for task in
                   ["fish_lure", "fish_lure_fast", "key_task",
                    "key_task_fast", "hexagon_task", "hexagon_task_fast"]
                   for view in ["cam1", "cam2"]],
    "CMT": ["board_robot", "box_robot", "cup_on_table", "juice", "lemming",
            "liquor", "sylvester", "ball", "car", "car_2", "carchase",
            "dog1", "gym", "jumping", "mountain_bike", "person",
            "person_crossing", "person_partially_occluded", "singer",
            "track_running"],
    "VOT": ["woman", "ball", "basketball", "bicycle", "bolt", "car", "david",
            "diving", "drunk", "fernando", "fish1", "fish2", "gymnastics",
            "hand1", "hand2", "jogging", "motocross", "polarbear", "skating",
            "sphere", "sunshade", "surfing", "torus", "trellis", "tunnel"],
    "VIVID": ["pktest03", "egtest01", "egtest02", "egtest03", "egtest04",
              "egtest05", "pktest01", "pktest02", "redteam"],
    "Synthetic": [],   # generated on demand (utils.synth)
    "Live": [],
}

ACTORS = list(SEQUENCES)


def sequence_names(actor: str) -> list[str]:
    if actor not in SEQUENCES:
        raise ValueError(f"unknown actor {actor!r}; known: {ACTORS}")
    return SEQUENCES[actor]


def sequence_by_id(actor: str, seq_id: int) -> str:
    return sequence_names(actor)[seq_id]
