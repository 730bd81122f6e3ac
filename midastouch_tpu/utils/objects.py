"""Object registries (reference: modules/objects.py:10-68) plus the
framework's built-in procedural objects, which need no downloads."""

ycb_test = [
    "004_sugar_box",
    "005_tomato_soup_can",
    "006_mustard_bottle",
    "021_bleach_cleanser",
    "025_mug",
    "035_power_drill",
    "037_scissors",
    "042_adjustable_wrench",
    "048_hammer",
    "055_baseball",
]

ycb_train = [
    "002_master_chef_can", "003_cracker_box", "007_tuna_fish_can",
    "008_pudding_box", "009_gelatin_box", "010_potted_meat_can", "011_banana",
    "012_strawberry", "013_apple", "014_lemon", "015_peach", "016_pear",
    "017_orange", "018_plum", "019_pitcher_base", "024_bowl", "026_sponge",
    "029_plate", "030_fork", "031_spoon", "032_knife", "033_spatula",
    "036_wood_block", "038_padlock", "040_large_marker", "043_phillips_screwdriver",
    "044_flat_screwdriver", "050_medium_clamp", "051_large_clamp",
    "052_extra_large_clamp", "053_mini_soccer_ball", "054_softball",
    "056_tennis_ball", "057_racquetball", "058_golf_ball", "061_foam_brick",
    "062_dice", "063-a_marbles", "065-a_cups", "070-a_colored_wood_blocks",
]

mcmaster_models = ["cotter-pin", "steel-nail", "eyebolt"]

misc_obj_models = ["grey_pitcher", "blue_shoe", "white_binder"]

# procedural assets shipped with this framework (geometry/procedural.py)
procedural_models = [
    "sphere", "box", "cylinder", "potato", "rock", "pebble", "boulder",
    "crag", "mound", "megalith",
]


def is_procedural(name: str) -> bool:
    return name in procedural_models


def is_small_part(name: str) -> bool:
    """Small parts get the looser contact-area gate (reference filter.py:54)."""
    return name not in ycb_test and name not in procedural_models
