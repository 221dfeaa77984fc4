"""Dataset generation CLI (reference src/pdp/generator.py __main__).

Sweeps the alpha range in `res` bands, writing a DIMACS directory and a JSON
file per band.

Usage:
  python -m pdp_solver_tpu.cli.generate OUT_DIR OUT_JSON NAME SIZE METHOD \
      [--min_n ..] [--max_n ..] [--min_k ..] ... [-s]
"""

import argparse
import os
import sys

from pdp_solver_tpu.fg.dimacs import write_dimacs
from pdp_solver_tpu.fg.generators import (
    UniformCNFGenerator, ModularCNFGenerator, VariableModularCNFGenerator)
from pdp_solver_tpu.fg.jsonfmt import instance_to_line


def _instance_to_clauses(n, gmap, signs):
    m = int(gmap[1].max()) + 1 if gmap.shape[1] else 0
    clauses = [[] for _ in range(m)]
    for v, c, s in zip(gmap[0], gmap[1], signs):
        clauses[int(c)].append(int((v + 1) * s))
    return clauses


def generate_dataset(generator, size, out_dimacs, out_json, name,
                     alpha_resolution=10, sat_only=False, label_fn=None):
    """Sweep the alpha range in bands (reference generator.py:53-92).

    label_fn (e.g. fg.generators.label_instances) labels each band by
    actually SOLVING the instances — the reference's is_sat is a stub
    returning False (generator.py:15-17), which makes its own `sat_only`
    path write nothing; with a real labeler `sat_only` works."""
    if sat_only and label_fn is None:
        raise ValueError(
            "sat_only needs a label_fn: generators label everything -1 "
            "(unknown), so the filter would reject every instance — pass "
            "fg.generators.label_instances (the CLI --label path does)")
    os.makedirs(out_dimacs, exist_ok=True)
    os.makedirs(out_json, exist_ok=True)
    alpha_min, alpha_max = generator._min_alpha, generator._max_alpha
    inc = (alpha_max - alpha_min) / alpha_resolution

    for j in range(alpha_resolution):
        lo = alpha_min + j * inc
        postfix = f"_{j}_{lo}_{lo + inc}"
        band_dir = os.path.join(out_dimacs, name + postfix)
        os.makedirs(band_dir, exist_ok=True)
        generator._min_alpha, generator._max_alpha = lo, lo + inc

        collected = []
        for _ in range(50):  # band retry budget (reference generator.py:55)
            need = size - len(collected)
            if need <= 0:
                break
            batch = [generator.generate()[:5] for _ in range(need)]
            if label_fn is not None:
                batch = label_fn(batch)
            if sat_only:
                batch = [b for b in batch if b[4] == 1]
            collected.extend(batch)
        if len(collected) < size:
            # downstream consumers expect `size` lines per band; a silent
            # short dataset looks identical to a complete one
            print(f"WARNING: band {name + postfix}: only {len(collected)}"
                  f"/{size} instances after the retry budget"
                  + (" (sat_only filter)" if sat_only else ""),
                  file=sys.stderr)

        with open(os.path.join(out_json, name + postfix + ".json"),
                  "w") as f:
            for i, (n, m, gmap, signs, label) in enumerate(
                    collected[:size]):
                f.write(instance_to_line(n, m, gmap, signs, label) + "\n")
                # encode the label so label_from_filename round-trips it:
                # last stem char must be the digit, or a non-digit for
                # unlabeled (-1); "sat=-1" would re-parse as label 1
                tag = str(int(label)) if label in (0, 1) else "unknown"
                fname = f"dimacs_{i}_sat={tag}.DIMACS"
                write_dimacs(os.path.join(band_dir, fname), n,
                             _instance_to_clauses(n, gmap, signs))
                print("Dataset %2d/%2d: %.2f %% complete  " % (
                    j + 1, alpha_resolution, 100.0 * (i + 1) / size),
                    end="\r", file=sys.stderr)
    generator._min_alpha, generator._max_alpha = alpha_min, alpha_max


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("out_json")
    parser.add_argument("name")
    parser.add_argument("size", type=int)
    parser.add_argument("method")
    parser.add_argument("--min_n", type=int, default=40)
    parser.add_argument("--max_n", type=int, default=40)
    parser.add_argument("--min_c", type=int, default=10)
    parser.add_argument("--max_c", type=int, default=40)
    parser.add_argument("--min_q", type=float, default=0.3)
    parser.add_argument("--max_q", type=float, default=0.9)
    parser.add_argument("--min_k", type=int, default=3)
    parser.add_argument("--max_k", type=int, default=5)
    parser.add_argument("--min_a", type=float, default=2)
    parser.add_argument("--max_a", type=float, default=10)
    parser.add_argument("--res", type=int, default=5)
    parser.add_argument("-s", "--sat_only", action="store_true")
    parser.add_argument("--label", action="store_true",
                        help="label instances by solving them (verified "
                             "SAT -> 1, otherwise unknown -1)")
    parser.add_argument("--label_iters", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=None)
    a = parser.parse_args(argv)

    if a.method == "modular":
        gen = ModularCNFGenerator(a.min_k, a.min_n, a.max_n, a.min_q, a.max_q,
                                  a.min_c, a.max_c, a.min_a, a.max_a,
                                  seed=a.seed)
    elif a.method == "v-modular":
        gen = VariableModularCNFGenerator(
            a.min_k, a.max_k, a.min_n, a.max_n, a.min_q, a.max_q, a.min_c,
            a.max_c, a.min_a, a.max_a, seed=a.seed)
    else:
        gen = UniformCNFGenerator(a.min_n, a.max_n, a.min_k, a.max_k,
                                  a.min_a, a.max_a, seed=a.seed)
    label_fn = None
    if a.label or a.sat_only:
        from pdp_solver_tpu.fg.generators import label_instances
        label_fn = lambda b: label_instances(b, iterations=a.label_iters)
    generate_dataset(gen, a.size, a.out_dir, a.out_json, a.name, a.res,
                     a.sat_only, label_fn=label_fn)


if __name__ == "__main__":
    main()
