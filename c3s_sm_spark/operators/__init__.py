from c3s_sm_spark.operators.calendar import (  # noqa: F401
    FREQS,
    day_start,
    dekad_start,
    month_start,
    next_period_start,
    temporal_grid,
    window_start,
)
from c3s_sm_spark.operators.dedup import keep_latest, keep_top_k  # noqa: F401
from c3s_sm_spark.operators.dedup_text import (  # noqa: F401
    lcs_pairs,
    local_align_pairs,
)
from c3s_sm_spark.operators.gapfill import gap_fill  # noqa: F401
from c3s_sm_spark.operators.intervals import (  # noqa: F401
    interval_join,
    interval_overlap_join,
    merge_intervals,
)
from c3s_sm_spark.operators.rollup import cascade, rollup  # noqa: F401
from c3s_sm_spark.operators.salting import salted_repartition  # noqa: F401
from c3s_sm_spark.operators.timeseries import (  # noqa: F401
    asof_join,
    asof_join_scalable,
    counter_increase,
    ewma,
    interp_linear_micro,
    lag_corr_pieces,
    lttb,
    ohlc,
    paired_validation,
    range_window_sums,
    nearest_match,
    nearest_match_scalable,
    session_agg,
    session_stats,
    sessionize,
    sessionize_scalable,
    time_weighted_sums,
    validation_scores,
    value_histogram,
)
from c3s_sm_spark.operators.sampling import (  # noqa: F401
    quantile_normalize,
)
from c3s_sm_spark.operators.textstats import (  # noqa: F401
    burst_detect,
    characteristic_terms,
    chunk_documents,
    rle_profile,
    source_divergence,
    texttiling_pieces,
    trending_tokens,
    vocab_drift,
    vocab_growth,
    vocab_growth_approx,
)
from c3s_sm_spark.operators.timeseries import (  # noqa: F401
    adf_pieces,
    adf_scores,
    binseg_changepoints,
    conformal_pieces,
    croston_smooth,
    dickey_fuller_pieces,
    dickey_fuller_scores,
    dtw_distances,
    dtw_lb_keogh,
    hampel_filter,
    holt_winters_seasonal,
    isotonic_blocks,
    matrix_profile_sad,
    pelt_changepoints,
    whittaker_smooth,
)
