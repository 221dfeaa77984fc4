"""DIMACS -> compact JSON converter CLI (reference src/dimacs2json.py).

Usage: python -m pdp_solver_tpu.cli.dimacs2json IN_DIR OUT_FILE [-s] [-p]
"""

import argparse
import os
import sys

from pdp_solver_tpu.fg.dimacs import (
    parse_dimacs, compact, label_from_filename)
from pdp_solver_tpu.fg.jsonfmt import clauses_to_line


def convert_file(path, out_file, propagate, label=None):
    n, _, clauses = parse_dimacs(path)
    n, clauses = compact(n, clauses, propagate)
    if label is None:
        label = label_from_filename(path)
    out_file.write(clauses_to_line(n, clauses, label,
                                   [os.path.basename(path)]) + "\n")


def convert_file_to(path, out_path, propagate):
    with open(out_path, "w") as f:
        convert_file(path, f, propagate)


def convert_directory(dimacs_dir, out_path, propagate, only_positive=False):
    names = sorted(os.listdir(dimacs_dir))
    with open(out_path, "w") as f:
        for i, name in enumerate(names):
            full = os.path.join(dimacs_dir, name)
            if not os.path.isfile(full):
                continue
            ext = os.path.splitext(name)[1].lower()
            if ext not in (".dimacs", ".cnf"):
                continue
            label = label_from_filename(full)
            if only_positive and label == 0:
                continue
            convert_file(full, f, propagate, label)
            print("Converting: %6.2f%% complete..." % (
                (i + 1) * 100.0 / len(names)), end="\r", file=sys.stderr)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("in_dir")
    parser.add_argument("out_file")
    parser.add_argument("-s", "--simplify", action="store_true",
                        help="drop subsumed clauses")
    parser.add_argument("-p", "--positive", action="store_true",
                        help="keep only SAT-labeled files")
    args = parser.parse_args(argv)
    convert_directory(args.in_dir, args.out_file, args.simplify,
                      args.positive)


if __name__ == "__main__":
    main()
