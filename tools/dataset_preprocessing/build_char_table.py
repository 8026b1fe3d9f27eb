"""Build a text-recognition character table from dataset labels.

Consolidates /root/reference/SimpleAICV/text_recognition/
char_table_processing/{001.processing_common_standard_chinese_characters
_table,002.combine...,003.deduplication_total_char_table}.py: collect every
character that appears in the given label files (one transcript per line,
or the framework's json label format), merge with optional base tables
(e.g. the GB standard Chinese set + ascii), deduplicate preserving
insertion order, and write one char per line — the `chars_file` consumed
by CTCTextLabelConverter.
"""

import argparse
import json
import os
import string


def chars_from_labels(path):
    chars = []
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        texts = data.values() if isinstance(data, dict) else data
        for t in texts:
            chars.extend(str(t))
    else:
        with open(path, encoding="utf-8") as f:
            for line in f:
                chars.extend(line.rstrip("\n"))
    return chars


def main():
    p = argparse.ArgumentParser(description="build char table")
    p.add_argument("--label-files", nargs="+", required=True)
    p.add_argument("--base-tables", nargs="*", default=[],
                   help="existing char-per-line tables to merge first")
    p.add_argument("--include-ascii", action="store_true",
                   help="seed with digits + ascii letters + punctuation")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    seen = {}
    if args.include_ascii:
        for c in string.digits + string.ascii_letters + string.punctuation:
            seen.setdefault(c, True)
    for t in args.base_tables:
        with open(t, encoding="utf-8") as f:
            for line in f:
                c = line.rstrip("\n")
                if c:
                    seen.setdefault(c, True)
    for lf in args.label_files:
        for c in chars_from_labels(lf):
            if c and not c.isspace():
                seen.setdefault(c, True)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as f:
        for c in seen:
            f.write(c + "\n")
    print(f"wrote {len(seen)} chars to {args.output}")


if __name__ == "__main__":
    main()
