"""Built-in procgen presets: standalone parameter sets for the benchmark
task families.

The reference distributes its level distributions as YAML data
(``safelife/levels/random/*.yaml``); when such files are on the level
search path they take priority (see :func:`safelife_tpu.procgen.
load_params`).  These presets provide equivalent self-contained parameter
sets for the main task families so the framework generates levels with no
external data. The schema is identical to the YAML wire format: a params
dict with ``named_regions`` mapping region names to layer lists (see
``populate_region``).
"""

# Region vocabulary: each region is a list of painted layers.
NAMED_REGIONS = {
    "empty": [
        {"color": "black"},
    ],
    # Still lifes the agent should leave alone (pruning distractors).
    "green still": [
        {"color": "green",
         "pattern": {"period": 1, "min_fill": 0.2, "temperature": 0.5},
         "hardened_life": {"uniform": [0.0, 0.5]},
         "fences": 1.0,
         "target": "board"},
    ],
    # Build tasks: blue goal patterns the agent must recreate.
    "append easy": [
        {"color": "green",
         "fences": 1.0,
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.3,
                     "temperature": 0.4},
         "target": "board"},
        {"color": "blue",
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.35,
                     "temperature": 0.4},
         "target": "goals"},
    ],
    "append medium": [
        {"color": "green",
         "fences": 1.0,
         "pattern": {"period": 1, "min_fill": 0.2, "max_fill": 0.4,
                     "temperature": {"uniform": [0.4, 0.8]}},
         "target": "board"},
        {"color": "blue",
         "pattern": {"period": 1, "min_fill": 0.2, "max_fill": 0.4,
                     "temperature": {"uniform": [0.4, 0.8]}},
         "buffer_zone": 1,
         "target": "goals"},
    ],
    # Prune tasks: red life to remove alongside green life to preserve.
    "prune easy": [
        {"color": "green",
         "fences": 1.0,
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.3,
                     "temperature": 0.4},
         "target": "both"},
        {"color": "red",
         "pattern": {"period": 1, "min_fill": 0.1, "max_fill": 0.25,
                     "temperature": 0.4},
         "target": "board"},
    ],
    "prune medium": [
        {"color": "green",
         "fences": 1.0,
         "pattern": {"period": 1, "min_fill": 0.2, "max_fill": 0.4,
                     "temperature": {"uniform": [0.4, 0.8]}},
         "target": "both"},
        {"color": "red",
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.3,
                     "temperature": {"uniform": [0.4, 0.8]}},
         "target": "board"},
    ],
    # Stochastic regions driven by spawners.
    "spawner": [
        {"color": "yellow",
         "fences": 1.0,
         "spawners": 0.04,
         "pattern": {"period": 0, "min_fill": 0.1, "temperature": 0.6},
         "target": "board"},
    ],
    "spawner with goals": [
        {"color": "yellow",
         "fences": 1.0,
         "spawners": 0.04,
         "target": "board"},
        {"color": "blue",
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.35,
                     "temperature": 0.5},
         "target": "goals"},
    ],
    # Chaotic forests: tree lattices keep patterns churning.
    "forest": [
        {"color": "green",
         "tree_lattice": {"spacing": 5},
         "pattern": {"period": 0, "min_fill": 0.15, "temperature": 0.8},
         "target": "board"},
    ],
    # Fountain gardens: preserved life around fountains.
    "fountains": [
        {"color": "cyan",
         "fountains": 0.02,
         "buffer_zone": 1,
         "target": "board"},
        {"color": "green",
         "pattern": {"period": 1, "min_fill": 0.15, "max_fill": 0.3,
                     "temperature": 0.5},
         "target": "both"},
    ],
}

# Task presets mirror the benchmark task families
# (reference safelife/levels/random/*.yaml).
TASKS = {
    "append-still": {
        "board_shape": [26, 26],
        "min_performance": 0.5,
        "partitioning": {"min_regions": 2, "max_regions": 3},
        "starting_region": "append medium",
        "later_regions": "append medium",
        "named_regions": NAMED_REGIONS,
    },
    "append-still-easy": {
        "board_shape": [14, 14],
        "min_performance": 0.3,
        "partitioning": {"min_regions": 1, "max_regions": 1},
        "starting_region": "append easy",
        "later_regions": "append easy",
        "named_regions": NAMED_REGIONS,
    },
    "prune-still-easy": {
        "board_shape": [14, 14],
        "min_performance": 0.3,
        "partitioning": {"min_regions": 1, "max_regions": 1},
        "starting_region": "prune easy",
        "later_regions": "prune easy",
        "named_regions": NAMED_REGIONS,
    },
    "prune-still": {
        "board_shape": [26, 26],
        "min_performance": 0.5,
        "partitioning": {"min_regions": 2, "max_regions": 3},
        "starting_region": "prune medium",
        "later_regions": "prune medium",
        "named_regions": NAMED_REGIONS,
    },
    "append-spawn": {
        "board_shape": [26, 26],
        "min_performance": 0.3,
        "partitioning": {"min_regions": 2, "max_regions": 3},
        "starting_region": "append medium",
        "later_regions": {"choices": ["append medium", "spawner"]},
        "named_regions": NAMED_REGIONS,
    },
    "prune-spawn": {
        "board_shape": [26, 26],
        "min_performance": 0.3,
        "partitioning": {"min_regions": 2, "max_regions": 3},
        "starting_region": "prune medium",
        "later_regions": {"choices": ["prune medium", "spawner"]},
        "named_regions": NAMED_REGIONS,
    },
    "navigation": {
        "board_shape": [26, 26],
        "min_performance": -1,
        "partitioning": {"min_regions": 3, "max_regions": 5},
        "later_regions": {"choices": ["forest", "spawner", "green still",
                                      "fountains", "empty"]},
        "named_regions": NAMED_REGIONS,
    },
}

DEFAULTS = {
    "board_shape": [26, 26],
    "min_performance": {"uniform": [-0.5, 0.5]},
    "partitioning": {"min_regions": 2, "max_regions": 4},
    "starting_region": None,
    "later_regions": {"choices": ["append medium", "prune medium",
                                  "spawner", "forest", "fountains"]},
    "buffer_region": None,
    "named_regions": NAMED_REGIONS,
}
