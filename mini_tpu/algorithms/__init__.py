from mini_tpu.algorithms.bfs import (  # noqa: F401
    bfs,
    bfs_batch,
    bfs_cpu,
    BfsResult,
    validate_preds,
)
from mini_tpu.algorithms.sssp import (  # noqa: F401
    sssp,
    sssp_batch,
    sssp_cpu,
    SsspResult,
    validate_pred_tree,
)
from mini_tpu.algorithms.pagerank import (  # noqa: F401
    pagerank,
    pagerank_cpu,
    PageRankResult,
)
from mini_tpu.algorithms.coloring import (  # noqa: F401
    coloring,
    validate_coloring,
    ColoringResult,
)
from mini_tpu.algorithms.kcore import (  # noqa: F401
    kcore,
    kcore_cpu,
    kcore_cpu_true,
    KCoreResult,
)
from mini_tpu.algorithms.lspar import (  # noqa: F401
    lspar,
    lspar_cpu,
    LsparResult,
    is_prime,
)
from mini_tpu.algorithms.cc import (  # noqa: F401
    connected_components,
    cc_cpu,
    CCResult,
)
