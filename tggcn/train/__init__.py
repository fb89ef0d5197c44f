from tggcn.train.losses import (
    binary_cross_entropy_loss,
    budget_loss,
    decide_num_main_losses,
    multi_task_loss,
    nll_loss,
    select_loss,
    select_loss_learning_mask,
    select_loss_types,
)
from tggcn.train.multi_task import apply_mtll, init_mtll, mtll_weights
