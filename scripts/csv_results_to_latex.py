"""Convert metric CSVs to paper-grade LaTeX tables (reference
scripts/csv_results_to_latex.py + eval/evaluator.py:405-539).

Usage:
    python scripts/csv_results_to_latex.py results1.csv [results2.csv ...] \
        [type=modality|density|resolution|all] [caption=...] [out=table.tex]
"""

import sys

import pandas as pd

from _common import compose_from_argv  # noqa: F401 (sys.path side effect)


def main() -> None:
    paths = [a for a in sys.argv[1:] if a.endswith(".csv")]
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a and not a.endswith(".csv"))
    if not paths:
        print("usage: csv_results_to_latex.py <csv> [...] [type=modality] [out=table.tex]")
        return
    df = pd.concat([pd.read_csv(p) for p in paths], ignore_index=True)

    import logging

    from pixelspointspolygons_tpu.eval.evaluator import Evaluator

    ev = Evaluator.__new__(Evaluator)
    ev.logger = logging.getLogger("csv_results_to_latex")
    tex = ev.to_latex_table(
        df,
        table_type=kv.get("type", "modality"),
        caption=kv.get("caption", "Results"),
        label=kv.get("label", "tab:results"),
        outfile=kv.get("out"),
    )
    print(tex)


if __name__ == "__main__":
    main()
