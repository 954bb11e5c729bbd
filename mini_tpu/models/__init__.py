from mini_tpu.models.gcn import (  # noqa: F401
    GCNNorm,
    gcn_normalize,
    gcn_init,
    gcn_forward,
    gcn_forward_cpu,
    gcn_loss,
    gcn_train_step,
    gcn_init_opt,
)
