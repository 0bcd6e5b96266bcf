"""RGB renderer for SafeLife boards with procedurally-drawn sprites.

Capability parity with ``safelife/render_graphics.py`` (sprite compositing
at 14 px/cell, foreground color from the cell color, background tint from
the goal color; npz trajectory -> png/gif via ``render_file``).  The
reference ships a hand-drawn sprite sheet; here every sprite is generated
from geometry at import time — no binary assets.
"""

import os

import numpy as np

from .. import cells as C

SPRITE_SIZE = 14

# Cell colors (KRGYBMCW) as foreground RGB; goals as light background tints.
CELL_RGB = np.array([
    [64, 64, 64],      # black -> dark gray so it shows on white
    [220, 50, 47],     # red
    [60, 160, 60],     # green
    [200, 160, 30],    # yellow
    [60, 90, 220],     # blue
    [170, 70, 200],    # magenta
    [40, 170, 190],    # cyan
    [250, 250, 250],   # white
], np.uint8)
GOAL_RGB = np.array([
    [200, 200, 200],   # no goal -> light gray
    [240, 190, 190],
    [190, 230, 190],
    [240, 235, 180],
    [185, 210, 245],
    [230, 195, 240],
    [190, 235, 240],
    [252, 252, 252],
], np.uint8)


def _grid():
    s = SPRITE_SIZE
    y, x = np.mgrid[0:s, 0:s]
    cy = cx = (s - 1) / 2
    return x - cx, y - cy  # centered coords


def _make_sprites():
    """mask[type] in [0,1]: 1 = foreground color, 0 = background."""
    x, y = _grid()
    r = np.hypot(x, y)
    s = SPRITE_SIZE
    sprites = {}
    sprites[C.EMPTY] = np.zeros((s, s))
    sprites[C.LIFE] = (r <= 4.2).astype(float)
    sprites[C.HARD_LIFE] = ((r <= 5.2) & (r >= 2.2)).astype(float) \
        + (r < 1.5)
    wall = np.ones((s, s))
    wall[0, :] = wall[:, 0] = 0.7
    wall[-1, :] = wall[:, -1] = 0.4
    sprites[C.WALL] = wall
    crate = np.zeros((s, s))
    crate[1:-1, 1:-1] = 1.0
    crate[np.abs(np.abs(x) - np.abs(y)) < 1.0] = 0.35
    sprites[C.CRATE] = crate
    sprites[C.TREE] = ((np.abs(x) <= (y + 6) * 0.45) & (y < 5)).astype(float) \
        + ((np.abs(x) < 1.3) & (y >= 4)).astype(float)
    sprites[C.PLANT] = (r <= 3.0).astype(float) * 0.9 \
        + ((np.abs(x) < 1.0) & (y > 2)).astype(float)
    sprites[C.ICE_CUBE] = (((np.abs(x) > 4) | (np.abs(y) > 4))
                           & (np.abs(x) <= 6) & (np.abs(y) <= 6)
                           ).astype(float) + 0.3 * ((np.abs(x) <= 4)
                                                    & (np.abs(y) <= 4))
    sprites[C.SPAWNER] = ((np.abs(x) + np.abs(y)) <= 5.5).astype(float) * 0.8
    sprites[C.HARD_SPAWNER] = ((np.abs(x) + np.abs(y)) <= 6.5).astype(float)
    sprites[C.LEVEL_EXIT] = (np.abs(np.abs(x) - np.abs(y)) < 1.4).astype(float)
    sprites[C.FOUNTAIN] = ((np.abs(x) < 1.4) | (np.abs(y) < 1.4)).astype(float) \
        * ((np.abs(x) + np.abs(y)) < 8)
    sprites[C.PARASITE] = ((np.abs(x) < 1.4) & (y < 3)).astype(float) \
        + ((r <= 1.4) * (y > 3.5))
    sprites[C.WEED] = (((np.abs(x) < 1.2) | (np.abs(y) < 1.2)
                        | (np.abs(np.abs(x) - np.abs(y)) < 1.2)) & (r < 5.5)
                       ).astype(float)
    return sprites


def _agent_sprites():
    """Arrow sprites for the 4 orientations (0=up, 1=right, 2=down, 3=left)."""
    x, y = _grid()
    up = ((np.abs(x) <= (5 - y) * 0.5) & (y >= -5) & (y <= 5)).astype(float)
    return [up, np.rot90(up, -1), np.rot90(up, 2), np.rot90(up, 1)]


SPRITES = _make_sprites()
AGENT_SPRITES = _agent_sprites()
# Optional hand-drawn art: per-type (s, s, 3) sprite RGB multiplied into
# the foreground color, reference-style (render_graphics.py:100-102:
# tile = (1-alpha)*bg + alpha*sprite_rgb*fg).  Procedural sprites have no
# RGB component (equivalent to all-ones).  Populated by load_sprite_sheet.
SPRITE_RGB = {}
AGENT_SPRITE_RGB = None

# Reference sprite-sheet layout (render_graphics.py:24-44): (row, col) of
# each cell type's 14x14 tile; the agent's four orientations sit at row 0,
# cols 1-4.
_SHEET_LAYOUT = {
    C.EMPTY: (0, 0), C.LIFE: (1, 0), C.HARD_LIFE: (1, 1),
    C.WALL: (2, 2), C.CRATE: (2, 3), C.PLANT: (1, 3), C.TREE: (1, 4),
    C.ICE_CUBE: (2, 0), C.PARASITE: (2, 4), C.WEED: (1, 2),
    C.SPAWNER: (3, 0), C.HARD_SPAWNER: (3, 2), C.LEVEL_EXIT: (3, 1),
    C.FOUNTAIN: (2, 1),
}


def load_sprite_sheet(path):
    """Use a hand-drawn sprite sheet in the reference's format.

    ``path`` is a PNG laid out as a grid of 14x14 tiles exactly like the
    reference's ``safelife/sprites.png`` (loaded at
    ``render_graphics.py:13-23``): RGBA, alpha = the compositing mask,
    RGB multiplied into the per-cell foreground color.  Grayscale/RGB
    sheets (no alpha) use luminance as the mask.  Replaces the procedural
    sprites in place; call once at startup (the CLI honors the
    ``SAFELIFE_SPRITES`` environment variable).
    """
    global AGENT_SPRITE_RGB
    import imageio.v2 as imageio

    sheet = np.asarray(imageio.imread(path), np.float32) / 255.0
    if sheet.ndim == 2:
        sheet = sheet[..., None].repeat(3, axis=-1)
    s = SPRITE_SIZE

    def tile(i, j):
        t = sheet[s * i:s * i + s, s * j:s * j + s]
        if t.shape[:2] != (s, s):
            raise ValueError(f"sprite sheet too small for tile ({i},{j})")
        if t.shape[-1] == 4:
            return t[..., 3], t[..., :3]
        return t.mean(axis=-1), np.ones((s, s, 3), np.float32)

    for cell, (i, j) in _SHEET_LAYOUT.items():
        SPRITES[cell], SPRITE_RGB[cell] = tile(i, j)
    agents = [tile(0, 1 + k) for k in range(4)]
    AGENT_SPRITES[:] = [a[0] for a in agents]
    AGENT_SPRITE_RGB = [a[1] for a in agents]


if os.environ.get("SAFELIFE_SPRITES"):
    load_sprite_sheet(os.environ["SAFELIFE_SPRITES"])


def _sprite_mask(cell, orientation):
    """Clipped [0,1] sprite mask for one (color-stripped) cell value."""
    if cell == 0:
        return np.zeros((SPRITE_SIZE, SPRITE_SIZE))
    if cell & C.AGENT:
        mask = AGENT_SPRITES[orientation % 4]
    else:
        mask = SPRITES.get(cell & ~C.COLORS)
        if mask is None:
            mask = SPRITES[C.WALL] * 0.5
    return np.clip(mask, 0, 1)


def _sprite_rgb(cell, orientation):
    """(s, s, 3) sprite color (sheet art only; ones for procedural)."""
    if cell and (cell & C.AGENT) and AGENT_SPRITE_RGB is not None:
        return AGENT_SPRITE_RGB[orientation % 4]
    rgb = SPRITE_RGB.get(cell & ~C.COLORS) if cell else None
    return np.ones((SPRITE_SIZE, SPRITE_SIZE, 3), np.float32) \
        if rgb is None else rgb


def render_board(board, goals=None, orientation=0):
    """(H, W) board -> (H*14, W*14, 3) uint8 RGB image.

    Fully vectorized (one sprite-table gather + one blend) — the renderer
    runs on 1000-frame episode gifs at every training checkpoint, so a
    per-cell Python loop is too slow.
    """
    board = np.asarray(board, np.uint16)
    goals = np.zeros_like(board) if goals is None else np.asarray(goals)
    h, w = board.shape
    s = SPRITE_SIZE
    goal_colors = (goals & C.COLORS) >> C.COLOR_BIT
    cell_colors = (board & C.COLORS) >> C.COLOR_BIT

    # One mask per DISTINCT cell value on this board (a handful), gathered
    # into an (H, W, s, s) mask field.
    values, inverse = np.unique(board, return_inverse=True)
    table = np.stack([_sprite_mask(int(v), orientation) for v in values]
                     ).astype(np.float32)
    m = table[inverse].reshape(h, w, s, s)[..., None]

    bg = GOAL_RGB[goal_colors].astype(np.float32)[:, :, None, None, :]
    fg = CELL_RGB[cell_colors].astype(np.float32)[:, :, None, None, :]
    if SPRITE_RGB:  # hand-drawn sheet art: fg modulated per pixel
        rgb_table = np.stack([_sprite_rgb(int(v), orientation)
                              for v in values]).astype(np.float32)
        fg = fg * rgb_table[inverse].reshape(h, w, s, s, 3)
    tiles = (bg * (1 - m) + fg * m).astype(np.uint8)  # (H, W, s, s, 3)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(h * s, w * s, 3)


def render_game(game, view_size=None):
    """Render a SafeLifeGame to RGB (optionally agent-centered)."""
    from .text import recenter_view
    board, goals = game.board, game.goals
    if view_size is not None:
        center = (game.agent_loc[1], game.agent_loc[0])
        board = recenter_view(board, view_size, center, game.exit_locs)
        goals = recenter_view(goals, view_size, center)
    return render_board(board, goals, game.orientation)


def render_file(fname, duration=0.1):
    """Render a level npz (single frame -> .png) or a recorded trajectory
    npz with stacked boards (-> .gif).  Returns the output path."""
    data = np.load(fname)
    keys = data.files
    base = fname[:-4] if fname.endswith(".npz") else fname
    if "board" in keys and np.asarray(data["board"]).ndim == 3:
        boards = np.asarray(data["board"])
        goals = np.asarray(data["goals"]) if "goals" in keys else \
            np.zeros_like(boards)
        orientations = np.asarray(data["orientation"]) \
            if "orientation" in keys else np.zeros(len(boards), int)
        frames = [render_board(b, g, int(o))
                  for b, g, o in zip(boards, goals, orientations)]
        out = base + ".gif"
        import imageio
        imageio.mimwrite(out, frames, duration=duration)
    else:
        board = np.asarray(data["board"])
        goals = np.asarray(data["goals"]) if "goals" in keys else None
        orientation = int(data["orientation"]) if "orientation" in keys else 0
        frame = render_board(board, goals, orientation)
        out = base + ".png"
        import imageio
        imageio.imwrite(out, frame)
    return out
