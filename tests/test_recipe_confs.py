"""Conf-lint over every shipped recipe: each trainer conf must merge over
its recipe's default.yml and construct the full model/optimizer set it
names.  Catches YAML drift (a renamed key, a missing block) across the
egs/vaevc recipes without running any stage — the reference has no
equivalent guard, its run.sh greps conf values at shell level and fails
mid-stage instead.
"""

from pathlib import Path

import pytest

from crank_tpu.train.factory import build_models
from crank_tpu.train.optim import make_optimizers
from crank_tpu.utils.config import load_yaml

REPO = Path(__file__).resolve().parents[1]
RECIPES = sorted((REPO / "egs" / "vaevc").iterdir())

TRAINER_CONFS = [
    (recipe.name, conf)
    for recipe in RECIPES
    for conf in sorted(recipe.glob("conf/*.yml"))
    if conf.name not in ("default.yml", "spkr.yml")
    and "vocoder" not in conf.name
]

VOCODER_CONFS = [
    (recipe.name, conf)
    for recipe in RECIPES
    for conf in sorted(recipe.glob("conf/*vocoder*.yml"))
]


@pytest.mark.parametrize(
    "recipe,conf", TRAINER_CONFS, ids=[f"{r}/{c.stem}" for r, c in TRAINER_CONFS]
)
def test_trainer_conf_builds(recipe, conf):
    merged = load_yaml(conf, default_ymlf=conf.parent / "default.yml")
    assert merged["trainer_type"] in ("vqvae", "lsgan", "cyclegan", "stargan")
    assert merged["input_feat_type"] in ("mlfb", "mcep", "excit")
    assert merged["output_feat_type"] in ("mlfb", "mcep", "excit")
    models = build_models(merged, spkr_size=4)
    assert "G" in models
    if merged["trainer_type"] in ("lsgan", "cyclegan", "stargan"):
        assert "D" in models, f"{conf}: GAN conf built no discriminator"
    opts = make_optimizers(merged, list(models.keys()))
    assert set(opts) == set(models)
    # stage-6/7 geometry keys every synthesis path needs
    feat = merged["feature"]
    for key in ("fs", "fftl", "hop_size", "shiftms", "mcep_alpha",
                "mlfb_dim", "fmin", "fmax"):
        assert key in feat, f"{conf}: feature.{key} missing"


@pytest.mark.parametrize(
    "recipe,conf", VOCODER_CONFS, ids=[f"{r}/{c.stem}" for r, c in VOCODER_CONFS]
)
def test_vocoder_conf_keys(recipe, conf):
    merged = load_yaml(conf, default_ymlf=conf.parent / "default.yml")
    voc = merged.get("vocoder", merged)
    for key in ("layers", "stacks", "batch_size", "n_steps"):
        assert key in voc, f"{conf}: vocoder {key} missing"
