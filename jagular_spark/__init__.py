"""jagular_spark — PySpark-native analytics engine with the data-processing
capabilities of kemerelab/jagular (out-of-core timestamped-signal
preprocessing), rebuilt Spark-first.

Subpackages
-----------
- ``sources``    : binary ``.rec`` source (schema-on-read XML config parse +
                   Arrow ``mapInPandas`` decoder), file catalog with ts-bounds
                   pruning. (SURVEY §2.1 S1-S7)
- ``operators``  : timestamp hygiene (dedup/sortedness/segments/gaps),
                   linear gap interpolation, zero-phase filtering within
                   epochs, spike detection (threshold/crossings/censor/
                   extract), sub-sample waveform alignment, as-of/range joins.
                   (SURVEY §2.2-§2.7)
- ``functions``  : large-scale training-data-pipeline ops — exact/MinHash/
                   SimHash dedup, embedding similarity search, text analysis,
                   multimodal column plumbing.
- ``streaming``  : Structured Streaming variants (session windows, stateful
                   censor).

Everything is expressed against the public DataFrame API so Catalyst can
push filters/projections and pick physical join strategies; scipy kernels
run as Arrow-vectorized pandas UDFs only where built-ins cannot express the
semantics (SURVEY §4).
"""

__version__ = "0.1.0"
