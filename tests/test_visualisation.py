"""Visualisation + dump outputs (plot_segmentation, label bars)."""

import os

import numpy as np

from tggcn.visualisation import (
    create_label_bar,
    determine_xlabels_and_xticks_positions,
    plot_segmentation,
)


def test_create_label_bar():
    bar = create_label_bar([1, 2, 2], bar_height=4, bar_width=3)
    assert bar.shape == (4, 9)
    assert (bar[:, :3] == 1).all() and (bar[:, 3:] == 2).all()


def test_xlabels_positions():
    labels, ticks = determine_xlabels_and_xticks_positions([5, 5, 5, 7, 7, 9], 2)
    assert labels == [5, 7, 9]
    assert len(ticks) == 3


def test_plot_segmentation_writes_png(tmp_path):
    save_file = str(tmp_path / "seg.png")
    gt = [0, 0, 1, 1, 2, 2, 2]
    pred = [0, 1, 1, 1, 2, 0, 2]
    plot_segmentation(gt, pred, class_id_to_label={i: f"c{i}" for i in range(3)},
                      save_file=save_file, xlabels_type="id")
    assert os.path.exists(save_file) and os.path.getsize(save_file) > 0
