from tggcn.nn.mlp import apply_linear, apply_mlp, init_linear, init_mlp
from tggcn.nn.gru import (
    apply_gru_cell,
    gru_gates_input,
    gru_step_from_gates,
    init_gru_cell,
    run_bigru,
    run_gru,
)
from tggcn.nn.batchnorm import apply_batchnorm, init_batchnorm
from tggcn.nn.geo_gcn import apply_geo_gcn, init_geo_gcn
from tggcn.nn.distributions import (
    discrete_estimator,
    straight_through_estimator,
    straight_through_gumbel_sigmoid,
)
from tggcn.nn.temporal import (
    assemble_segment_length_tensor,
    assemble_time_tensor,
    filter_soft_decisions,
    make_periodic_embedding,
    reorder_hidden_states,
)
