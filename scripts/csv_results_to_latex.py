"""Convert metric CSVs to LaTeX tables (reference scripts/csv_results_to_latex.py).

Usage: python scripts/csv_results_to_latex.py results1.csv [results2.csv ...]
"""

import sys

import pandas as pd


def main() -> None:
    paths = [a for a in sys.argv[1:] if a.endswith(".csv")]
    if not paths:
        print("usage: csv_results_to_latex.py <csv> [...]")
        return
    df = pd.concat([pd.read_csv(p) for p in paths], ignore_index=True)
    num_cols = df.select_dtypes("number").columns
    df[num_cols] = df[num_cols].round(3)
    print(df.to_latex(index=False))


if __name__ == "__main__":
    main()
