"""Character tables for text recognition.

Parity with /root/reference/SimpleAICV/text_recognition/char_sets/
(num_and_alpha / common-standard-Chinese / final 12k-char tables): the
reference ships its merged tables as python files; here tables are plain
char-per-line files consumed via CTCTextLabelConverter(chars_file=...).
ascii_char_table.txt (digits+letters+punctuation) ships as the default;
build dataset-specific tables with
tools/dataset_preprocessing/build_char_table.py (it can merge the GB
standard set and dataset label files exactly like the reference's
char_table_processing scripts).
"""

import os

CHAR_SETS_DIR = os.path.dirname(os.path.abspath(__file__))
ASCII_CHAR_TABLE = os.path.join(CHAR_SETS_DIR, "ascii_char_table.txt")
# the merged 12,111-char table (digits + ascii + common symbols + the GB
# common-standard Chinese table + Modern Chinese Dictionary additions),
# regenerated from the reference's final_char_table list as plain data
FINAL_CHAR_TABLE = os.path.join(CHAR_SETS_DIR, "final_char_table.txt")

# per-category tables for the per-category LCS PR eval sweep (reference
# num_and_alpha_char_table.py + common_standard_chinese_char_table.py —
# the GB 通用规范汉字表 level 1/2/3 lists, 3500/3000/1605 chars, shipped
# as plain data like the merged table)
NUM_CHAR_TABLE = os.path.join(CHAR_SETS_DIR, "num_char_table.txt")
ALPHA_CHAR_TABLE = os.path.join(CHAR_SETS_DIR, "alpha_char_table.txt")
CHINESE_LEVEL1_CHAR_TABLE = os.path.join(
    CHAR_SETS_DIR, "chinese_level1_char_table.txt")
CHINESE_LEVEL2_CHAR_TABLE = os.path.join(
    CHAR_SETS_DIR, "chinese_level2_char_table.txt")
CHINESE_LEVEL3_CHAR_TABLE = os.path.join(
    CHAR_SETS_DIR, "chinese_level3_char_table.txt")


def load_char_table(path):
    """Char-per-line table file -> list of chars (blank lines = space)."""
    chars = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            chars.append(line if line else " ")
    return chars


def default_category_tables():
    """{category: [chars]} for CategoryLCSMeter — the reference's
    num/alpha/Chinese-level-1/2/3 eval categories."""
    return {
        "num": load_char_table(NUM_CHAR_TABLE),
        "alpha": load_char_table(ALPHA_CHAR_TABLE),
        "chinese_l1": load_char_table(CHINESE_LEVEL1_CHAR_TABLE),
        "chinese_l2": load_char_table(CHINESE_LEVEL2_CHAR_TABLE),
        "chinese_l3": load_char_table(CHINESE_LEVEL3_CHAR_TABLE),
    }
