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
