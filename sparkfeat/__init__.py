"""sparkfeat — a from-scratch PySpark-native point-in-time feature-generation engine.

Re-expresses the capabilities of the reference library
(``alpha-i/library-feature-generation``, see /root/repo/SURVEY.md) as
declarative Spark DataFrame plans over a long table of multi-turn
conversation transcripts::

    conv_id: string, turn_idx: int, role: string, text: string,
    tool: string, ts: timestamp

Design stance (SURVEY.md §7):

* one windowed DataFrame plan per feature set — no per-prediction-date
  fan-out (the reference re-scans history once per date,
  ``transformation/financial.py:96-101``; we compute every prediction
  point in a single pass over ``Window.partitionBy('conv_id')``);
* Column expressions wherever closed-form; Arrow-vectorized
  ``applyInPandas`` only where sequential pandas-exact semantics demand
  it (EWMA, GASF/GADF/MTF);
* fit/apply split via stats tables + broadcast joins;
* no RDDs, no per-row Python UDFs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

from sparkfeat.session import get_spark  # noqa: F401
