from tggcn.data.assembly import (
    segmentation_from_output_class,
    smooth_segmentation,
)
from tggcn.data.loading import (
    determine_num_classes,
    input_size_from_data_loader,
    load_testing_data,
    load_training_data,
    select_model_data_feeder,
    select_model_data_fetcher,
    split_train_test,
)
