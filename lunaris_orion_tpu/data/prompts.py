"""Combinatorial prompt engine for dataset synthesis.

Same mechanism as the reference's PixelArtGenerator prompt system
(generate.py:57-777): 10 weighted categories, style/color/detail/lighting
banks, a special-token template `[CATEGORY]...[STYLE]...[DETAIL]...[COLOR]...
[END]` capped at 77 whitespace tokens, per-category generation parameters,
and prompt de-duplication. Bank *content* here is original (the mechanism is
the contract, not the word lists).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

MAX_PROMPT_TOKENS = 77

# category -> sampling weight (reference: generate.py:67-78)
CATEGORY_WEIGHTS: Dict[str, float] = {
    "character": 0.18,
    "monster": 0.14,
    "item": 0.12,
    "weapon": 0.10,
    "environment": 0.10,
    "building": 0.09,
    "food": 0.08,
    "vehicle": 0.07,
    "nature": 0.07,
    "effect": 0.05,
}

SUBJECTS: Dict[str, List[str]] = {
    "character": ["knight", "wizard", "rogue", "archer", "paladin", "bard",
                  "alchemist", "monk", "ranger", "necromancer", "pirate",
                  "astronaut", "samurai", "villager", "merchant"],
    "monster": ["slime", "goblin", "dragon whelp", "skeleton", "ghost",
                "mimic chest", "giant spider", "imp", "golem", "wyvern",
                "kraken spawn", "zombie", "harpy", "basilisk"],
    "item": ["health potion", "ancient scroll", "rune stone", "golden key",
             "treasure chest", "magic ring", "crystal orb", "spell book",
             "compass", "hourglass", "lantern", "amulet"],
    "weapon": ["longsword", "battle axe", "enchanted bow", "war hammer",
               "twin daggers", "magic staff", "halberd", "flail",
               "crossbow", "katana", "spear", "mace"],
    "environment": ["forest clearing", "mountain pass", "desert oasis",
                    "frozen lake", "lava cavern", "mushroom grove",
                    "coastal cliff", "swamp", "canyon", "meadow"],
    "building": ["stone castle", "wooden tavern", "wizard tower",
                 "windmill", "blacksmith forge", "chapel", "lighthouse",
                 "cottage", "fortress gate", "market stall"],
    "food": ["roasted turkey", "berry pie", "cheese wheel", "honey jar",
             "grilled fish", "bread loaf", "mushroom stew", "candy apple",
             "pumpkin soup", "chocolate cake"],
    "vehicle": ["sailing ship", "horse cart", "hot air balloon",
                "steam locomotive", "rowboat", "war chariot", "airship",
                "mine cart", "submarine", "sled"],
    "nature": ["oak tree", "rose bush", "cactus", "waterfall",
               "crystal formation", "bonsai", "sunflower", "coral reef",
               "boulder", "vine lattice"],
    "effect": ["fire burst", "ice shard", "lightning bolt", "poison cloud",
               "healing aura", "portal swirl", "smoke puff", "star sparkle",
               "shockwave ring", "shadow wisp"],
}

STYLES = ["16-bit retro", "8-bit minimal", "modern pixel", "isometric",
          "chibi", "dark fantasy", "pastel", "neon arcade", "monochrome",
          "painterly pixel"]

DETAILS = ["clean outlines", "dithered shading", "high contrast",
           "soft gradients", "chunky pixels", "fine details",
           "bold silhouette", "textured surfaces"]

COLORS = ["vibrant palette", "muted earth tones", "cool blues",
          "warm sunset hues", "forest greens", "royal purples",
          "fiery reds", "icy whites", "golden yellows", "twilight tones"]

LIGHTING = ["flat lighting", "dramatic side light", "ambient glow",
            "backlit rim light", "torch-lit", "moonlit", "noon sun",
            "magical luminescence"]


@dataclass(frozen=True)
class CategoryParams:
    """Per-category diffusion knobs (reference generate.py:180-241)."""
    guidance_scale: float
    pag_scale: float
    num_steps: int
    pixel_size: int


CATEGORY_PARAMS: Dict[str, CategoryParams] = {
    "character": CategoryParams(7.5, 3.0, 30, 8),
    "monster": CategoryParams(7.5, 3.0, 30, 8),
    "item": CategoryParams(7.0, 2.5, 25, 8),
    "weapon": CategoryParams(7.0, 2.5, 25, 8),
    "environment": CategoryParams(6.5, 2.0, 35, 4),
    "building": CategoryParams(6.5, 2.0, 30, 4),
    "food": CategoryParams(7.0, 2.5, 25, 8),
    "vehicle": CategoryParams(7.0, 2.5, 30, 8),
    "nature": CategoryParams(6.5, 2.0, 25, 4),
    "effect": CategoryParams(8.0, 3.5, 20, 8),
}


class PromptEngine:
    def __init__(self, seed: Optional[int] = None):
        self.rng = random.Random(seed)
        self.seen: set = set()

    def pick_category(self) -> str:
        cats, ws = zip(*CATEGORY_WEIGHTS.items())
        return self.rng.choices(cats, weights=ws, k=1)[0]

    def build_prompt(self, category: Optional[str] = None) -> Tuple[str, str]:
        """Returns (prompt, category). Template + 77-token cap
        (generate.py:57-64, 664-777)."""
        category = category or self.pick_category()
        subject = self.rng.choice(SUBJECTS[category])
        style = self.rng.choice(STYLES)
        detail = self.rng.choice(DETAILS)
        color = self.rng.choice(COLORS)
        light = self.rng.choice(LIGHTING)
        prompt = (f"[CATEGORY]{category}[SUBJECT]pixel art of a {subject}"
                  f"[STYLE]{style} style, {light}"
                  f"[DETAIL]{detail}[COLOR]{color}[END]")
        tokens = prompt.split()
        if len(tokens) > MAX_PROMPT_TOKENS:
            prompt = " ".join(tokens[:MAX_PROMPT_TOKENS])
        return prompt, category

    def unique_prompt(self, category: Optional[str] = None,
                      max_tries: int = 50) -> Tuple[str, str]:
        """De-duplicated prompt (generate.py:782-792)."""
        for _ in range(max_tries):
            prompt, cat = self.build_prompt(category)
            if prompt not in self.seen:
                self.seen.add(prompt)
                return prompt, cat
        return prompt, cat  # exhausted: allow a duplicate

    @staticmethod
    def params_for(category: str) -> CategoryParams:
        return CATEGORY_PARAMS[category]
