from tggcn.compat.torch_weights import (
    baseline_params_from_torch_state_dict,
    tggcn_params_from_torch_state_dict,
)
