from .generator import (  # noqa: F401
    build_alias_dim,
    build_pred_dim,
    ensure_synth,
    gen_conv_batch,
    n_convs_for_sf,
    synth_dir,
)
