import os

from tggcn.config import compose, load_config, save_config


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def make_conf(tmp_path):
    conf = str(tmp_path / "conf")
    _write(conf + "/config.yaml", """
defaults:
  - models: m1
  - data: d1
resources:
  use_gpu: true
  num_threads: 32
hydra:
  run:
    dir: outputs/${data.name}/${metadata.model_name}/${logging.checkpoint_name}
""")
    _write(conf + "/models/m1.yaml", """
metadata:
  model_name: 2G-GCN
  input_type: multiple
parameters:
  hidden_size: 512
optimization:
  batch_size: 8
  learning_rate: 1e-4
logging:
  root_log_dir: ${env:PWD}/outputs/${data.name}
  checkpoint_name: "hs${parameters.hidden_size}_bs${optimization.batch_size}_${data.cross_validation_test_subject}"
  log_dir: ${logging.root_log_dir}/${logging.checkpoint_name}
""")
    _write(conf + "/models/m2.yaml", """
metadata:
  model_name: other
parameters:
  hidden_size: 64
""")
    _write(conf + "/data/d1.yaml", """
data:
  name: mphoi
  cross_validation_test_subject: Subject45
  downsampling: 3
""")
    return conf


def test_compose_basic(tmp_path):
    conf = make_conf(tmp_path)
    cfg = compose(conf)
    assert cfg.metadata.model_name == "2G-GCN"
    assert cfg.data.name == "mphoi"
    assert cfg.parameters.hidden_size == 512
    assert cfg.optimization.learning_rate == 1e-4
    assert cfg.logging.checkpoint_name == "hs512_bs8_Subject45"
    assert cfg.logging.log_dir.endswith("/outputs/mphoi/hs512_bs8_Subject45")
    assert cfg.logging.root_log_dir.startswith(os.environ.get("PWD", ""))


def test_overrides(tmp_path):
    conf = make_conf(tmp_path)
    cfg = compose(conf, overrides=[
        "parameters.hidden_size=64",
        "data.cross_validation_test_subject=Subject25",
        "optimization.batch_size=2",
    ])
    assert cfg.parameters.hidden_size == 64
    assert cfg.logging.checkpoint_name == "hs64_bs2_Subject25"


def test_group_override(tmp_path):
    conf = make_conf(tmp_path)
    cfg = compose(conf, overrides=["models=m2"])
    assert cfg.metadata.model_name == "other"
    assert cfg.parameters.hidden_size == 64


def test_get_with_default(tmp_path):
    conf = make_conf(tmp_path)
    cfg = compose(conf)
    assert cfg.get("misc", default_value={}) == {}
    assert cfg.data.get("downsampling", default_value=1) == 3
    assert cfg.data.get("scaling_strategy", default_value=None) is None


def test_save_and_reload(tmp_path):
    conf = make_conf(tmp_path)
    cfg = compose(conf)
    frozen = str(tmp_path / "run" / ".hydra" / "config.yaml")
    save_config(cfg, frozen)
    cfg2 = load_config(frozen)
    assert cfg2.to_dict() == cfg.to_dict()
