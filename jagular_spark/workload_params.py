"""Shared workload parameters: constants and SQL fragments used by
BOTH the Spark query definitions (workloads.py) and their DuckDB
oracles (oracles.py). A third module so neither half imports the
other (no circular import in either import order).
"""

from __future__ import annotations

from jagular_spark import dsp

_DISC_PRICE_QUANTA = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    " * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))"
)


_BP_TAPS = dsp.firwin_bandpass(21, 0.05, 0.2, 1.0)   # band-pass (filtfilt)
_LP_TAPS = dsp.firwin_bandpass(21, None, 0.125, 1.0)  # low-pass (decimate, q=4)


# Shared SQL prefix: the same per-user rn stream + per-user value lists.
_ORDERED_LISTS_CTE = """
    ordered AS (
        SELECT user_id, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS rn
        FROM events
    ), lists AS (
        SELECT user_id, list(value ORDER BY rn) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered GROUP BY user_id
    )"""


def _fir_chain_sql(taps, rn: str = "o.rn", xs: str = "l.xs", n: str = "l.n") -> str:
    """Left-associated FIR dot product with reflect indexing — the exact
    fold order of dsp.fir_zero_phase; taps embedded as string-cast
    literals (array literals would round-trip through DECIMAL)."""
    half = (len(taps) - 1) // 2
    chain = "0.0"
    for k, t in enumerate(taps):
        d = k - half
        j = f"({rn} + {d})" if d >= 0 else f"({rn} - {-d})"
        refl = (
            f"(CASE WHEN {j} < 0 THEN -{j} "
            f"WHEN {j} >= {n} THEN 2*({n}-1) - {j} "
            f"ELSE {j} END) + 1"
        )
        chain = f"({chain} + CAST('{float(t)!r}' AS DOUBLE) * {xs}[{refl}])"
    return f"CASE WHEN {n} < {len(taps)} THEN 0.0 ELSE {chain} END"


# centroids make assignment/nprobe/ranking exact BIGINT arithmetic,
# hence fully SQL-expressible (see sim.ann_topk_ivf_frozen).
_IVF_FROZEN_CENTS: list[list[int]] = [
    [17147, -354, 44195, -93804, 8356, -21768, -14391, 13960, 59683, -18163, -14134, 7420, -40273, -8982, -13699, -2336, 56150, 39848, 24358, 29263, -60788, 11201, -10636, -17269, 3781, 81554, 93833, -6230, -16332, 65826, -26215, 67046, 6081, -43471, 4673, -55811, -7373, 15896, 22653, 10608, -841, 28, 1303, 68, 15999, 23958, 34559, -51874, 9835, -47366, 2294, 21260, 9320, -57817, 31548, 16950, -15406, 5118, -70614, -19648, -14546, 37669, 37151, -46332],
    [-24088, -22184, 11548, 2205, 12375, 30291, -96955, -9407, 2707, -5895, -55314, 47405, 67538, -81973, 32985, 2595, -4815, -21956, 31871, -49973, 33564, 18874, 3364, -25762, 37838, 74975, -7700, -17705, -1759, 12351, -23500, 5158, -2800, 5322, 17190, -1820, -48040, 11156, 21660, -76677, 3776, -40749, 19840, 13005, 21451, 18688, -35502, -14666, -66227, -93662, -16471, 10656, -18811, 4076, -23324, 44910, 49191, -4057, 31672, 11024, -22088, -3046, -48265, -11144],
    [-1151, 8456, -41534, 49235, 44732, -6920, -12233, 21564, -6012, -71251, -17702, -20910, -62746, 69977, 460, 8792, -26897, 48174, -8029, -22090, -365, 9238, 70466, -25242, -2749, -58243, 4506, -5124, 13912, 5057, -18048, -88896, 1901, 1978, 4780, 3506, 7569, 60847, 48816, 60787, -8027, -7190, 16222, 24756, -4873, -14213, -14962, -1295, 50283, 34946, 48207, -62670, -15930, -32005, 47440, 5443, 14319, -18378, 17147, 49879, 41304, 2738, 19389, 3400],
    [-24332, 29551, -18641, -17504, -14558, 28473, 26731, -1638, -33755, 1049, -3029, 43016, 17974, 86811, 14046, -14311, -42633, -47298, 14766, 35617, 8584, -2798, -23500, 11840, -13124, 30975, -31808, -14841, -64065, -36389, -2267, -8592, 84900, -12453, 3207, -19442, 10078, -30385, -36619, -27973, -6320, -41959, -73302, -37099, 4600, 3735, -16742, -40536, 63602, -46782, 11582, -20823, 14573, 20118, -41342, -36341, 13047, -6648, 34616, -47081, 35634, 4547, -4455, -46878],
    [27699, -745, 69510, -18022, -46224, -71920, 48581, -6374, 4561, 27097, 25543, -65047, 31428, -44679, 18021, -16545, 51216, 28124, 7972, 29147, -19160, 39591, -23983, 13308, -27643, 4045, 23305, 6388, 28798, -43873, 34377, -31571, 18411, 18487, 32653, -51063, 15791, -82421, -24097, 8342, 30023, -5741, -8067, 15808, -32944, 144, -34488, 66758, -35425, 2423, -11462, 6921, 24512, 17671, 88020, -19734, 148, -14573, 27528, -4051, -66794, -8083, 36748, 367],
    [-31472, -16906, 26157, -577, 53249, -13618, -50625, 68874, -17096, 18233, 24927, -13577, 4997, 8731, -17843, 7147, 3956, -47763, -15492, 33683, 6292, -25822, 28198, -10776, 25338, 44881, -34544, 6663, 6525, 18941, 9192, -27613, -297, -2396, 1646, 51002, 12344, 62673, -31898, 13262, -43158, 58632, 9653, 27522, -81432, -48429, 9167, -23798, -11549, 25424, 39604, 40703, 11785, 30440, -36793, -78537, 33603, -38693, 13306, -9042, -7404, 39542, -39921, 25616],
    [-22528, -44807, -11586, -16053, 47977, 71940, -29950, -51208, 7140, 47676, 59425, 16806, 11271, 47326, -18165, 44727, 26473, 52453, -61114, -46519, 2319, -12549, -3113, -57450, -42784, -17364, -5305, 48883, 28917, -43424, 7544, 1742, -15134, -46715, -23899, 46433, 21078, -15175, -10116, -7781, 35830, -38567, 3346, -23769, 1093, 14110, 29281, 47392, 9917, 21696, -28699, -136, 46422, -2877, 23588, 35380, -64042, 52877, -23004, -36909, 17334, -9938, -4692, 22749],
    [91574, 14662, -36089, 44567, -35677, 29183, -14257, 41359, -24665, -16323, 23224, 3345, -62150, -76466, -14049, 12731, -24008, 12494, 14621, 5521, -15520, -6779, -7809, 48813, 3986, -49882, -31441, 65205, -4178, 36146, 62827, 40585, -24679, 25747, 9996, 12442, -61071, -43492, 13626, 16399, -21495, -25586, 37919, -20260, -11116, 42121, 20818, 67298, -56452, 8847, 32809, -11938, -12095, -26643, -28293, 12249, 10305, 1228, -80137, -8887, 3560, -21126, 10883, -69367],
]


_STRATA_FRACTIONS = {"en": 0.5, "fr": 1.0, "de": 0.8, "es": 0.25}

# events_spike_clusters k-means fit sample: the Lloyd fit runs on the
# md5 hash-sampled subset of detections (fit-on-sample discipline —
# the collect is bounded by fraction, never O(all detections)). The
# salt is chosen so the deterministic sample keeps >= k rows at every
# shipped sf (5/5/7 at sf0.001/0.01/0.1); at production scale the
# fraction is what you shrink. Shared verbatim with the DuckDB oracle.
_SPIKE_FIT_FRACTION = 0.5
_SPIKE_FIT_SALT = "spkfit"

_REBALANCE_TARGETS = {"en": 0.2, "fr": 0.3, "de": 0.2, "es": 0.2, "zh": 0.1}

# docs_token_budget_sample: ABSOLUTE per-source token budgets (shared
# verbatim with the DuckDB oracle). Chosen to exercise all three
# regimes at every shipped sf: src1's budget exceeds its total (clamp
# to keep-all), src0/src2/src3/src4 cut at different depths, unlisted
# sources are dropped.
_TOKEN_BUDGETS = {"src0": 600, "src1": 1_000_000, "src2": 800, "src3": 400, "src4": 250}

# BPE tokenizer fit (docs_bpe_vocab): merges fitted on the absolute
# 256-doc md5 hash-sample (the quantizer fit_rows precedent — the fit
# cost is corpus-size-invariant), then frozen into literal replace
# chains for the row-local corpus encode. 16 merges keeps the oracle's
# unrolled fit chain (one CTE round per merge) compact while still
# exercising multi-level merges (pairs of merged symbols).
_BPE_MERGES = 16
_BPE_FIT_ROWS = 256

# Stop-shingle cutoff for the flagship exact-Jaccard dedup pass: a
# shingle hash shared by more than this many document occurrences is
# dropped from EVERY document's shingle set before the Jaccard (engine
# and oracle mirror the same cutoff), bounding per-bucket pair fanout
# at k² ≤ 400 instead of the unbounded 10^12-pair blowup one
# boilerplate phrase in 10^6 docs would cause. At sf0.01 no bucket
# reaches the cutoff (max observed 7); at sf0.1, 59 buckets drop —
# the mirror is exercised by the local sf0.1 oracle run.
_JACCARD_MAX_BUCKET = 20

# Hot-cluster cap for SemDeDup: clusters larger than this are
# deterministically sub-split into rank-contiguous cells of at most
# this many vectors before the within-cluster pair join (engine and
# oracle mirror the same split), hard-bounding per-cell pair fanout at
# cap² — the skew backstop for near-duplicate-heavy corpora where one
# k-means cell otherwise goes quadratic. At sf0.01 (~200 vectors / 16
# centroids) most cells sit under the cap; at sf0.1 (~2000 vectors)
# the split engages on every populated cell, exercising the mirror.
_SEMDEDUP_MAX_CLUSTER = 64

# BM25 retrieval query: fixed query-term set (shared by the Spark
# operator call and the DuckDB oracle so both score the identical
# query) and the idf integer quanta.
_BM25_TERMS = ("hash", "join", "vector", "stream")
_BM25_K = 25
_BM25_QUANTA = 1_000_000

