"""Token/index constants (reference: src/data/components/constants.py)."""

IGNORE_INDEX = -100
X_TOKEN_INDEX = {"IMAGE": -200, "VIDEO": -201, "AUDIO": -202, "THERMAL": -203, "DEPTH": -204}
X_INDEX_TOKEN = {v: k for k, v in X_TOKEN_INDEX.items()}
DEFAULT_X_TOKEN = {
    "IMAGE": "<image>", "VIDEO": "<video>", "AUDIO": "<audio>",
    "THERMAL": "<thermal>", "DEPTH": "<depth>",
}
DEFAULT_X_PATCH_TOKEN = {
    "IMAGE": "<im_patch>", "VIDEO": "<vi_patch>", "AUDIO": "<au_patch>",
    "THERMAL": "<th_patch>", "DEPTH": "<de_patch>",
}
DEFAULT_X_START_TOKEN = {
    "IMAGE": "<im_start>", "VIDEO": "<vi_start>", "AUDIO": "<au_start>",
    "THERMAL": "<th_start>", "DEPTH": "<de_start>",
}
DEFAULT_X_END_TOKEN = {
    "IMAGE": "<im_end>", "VIDEO": "<vi_end>", "AUDIO": "<au_end>",
    "THERMAL": "<th_end>", "DEPTH": "<de_end>",
}

# CLIP normalization stats used by every visual transform
# (reference: src/data/videoinstruct_datamodule.py:119-133)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
