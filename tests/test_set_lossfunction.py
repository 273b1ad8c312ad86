"""Loss-function validity matrix (mirrors reference tests/test_set_lossfunction.py)."""

import pytest

from deeprank2_tpu.dataset import GraphDataset
from deeprank2_tpu.domain import losstypes as losses
from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork
from deeprank2_tpu.ops import losses as loss_nn
from deeprank2_tpu.trainer import Trainer


@pytest.fixture
def classif_trainer(srv_hdf5):
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    return Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[])


@pytest.fixture
def regress_trainer(srv_hdf5):
    ds = GraphDataset(hdf5_path=srv_hdf5, target="irmsd")
    return Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[])


def test_defaults(classif_trainer, regress_trainer) -> None:
    assert isinstance(classif_trainer.lossfunction, loss_nn.CrossEntropyLoss)
    assert isinstance(regress_trainer.lossfunction, loss_nn.MSELoss)


@pytest.mark.parametrize("loss_cls", losses.regression_losses)
def test_regression_losses_valid(regress_trainer, loss_cls) -> None:
    regress_trainer.set_lossfunction(loss_cls)
    assert isinstance(regress_trainer.lossfunction, loss_cls)


@pytest.mark.parametrize("loss_cls", losses.classification_losses)
def test_classification_losses_valid(classif_trainer, loss_cls) -> None:
    classif_trainer.set_lossfunction(loss_cls)
    assert isinstance(classif_trainer.lossfunction, loss_cls)


@pytest.mark.parametrize("loss_cls", losses.classification_losses)
def test_classification_losses_invalid_for_regression(regress_trainer, loss_cls) -> None:
    with pytest.raises(ValueError):
        regress_trainer.set_lossfunction(loss_cls)


@pytest.mark.parametrize("loss_cls", losses.regression_losses)
def test_regression_losses_invalid_for_classification(classif_trainer, loss_cls) -> None:
    with pytest.raises(ValueError):
        classif_trainer.set_lossfunction(loss_cls)


@pytest.mark.parametrize("loss_cls", losses.other_losses)
def test_other_losses_rejected(classif_trainer, loss_cls) -> None:
    with pytest.raises(ValueError):
        classif_trainer.set_lossfunction(loss_cls)


def test_override_invalid(regress_trainer) -> None:
    regress_trainer.set_lossfunction(loss_nn.CrossEntropyLoss, override_invalid=True)
    assert isinstance(regress_trainer.lossfunction, loss_nn.CrossEntropyLoss)


def test_classif_weighted(srv_hdf5, tmp_path) -> None:
    """class_weights=True trains with a weight-capable loss and the weights
    survive a checkpoint round trip (reference test_set_lossfunction.py:80)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, class_weights=True, output_exporters=[])
    trainer.set_lossfunction(loss_nn.NLLLoss)
    model_path = str(tmp_path / "weighted.pth.tar")
    trainer.train(nepoch=1, batch_size=4, filename=model_path)
    assert isinstance(trainer.lossfunction, loss_nn.NLLLoss)

    pretrained = Trainer(
        VanillaNetwork,
        dataset_test=GraphDataset(hdf5_path=srv_hdf5, train_source=model_path),
        pretrained_model=model_path,
    )
    assert pretrained.class_weights


def test_classif_invalid_weighted(srv_hdf5) -> None:
    """A loss that takes no class weights fails loudly when class_weights=True
    (reference test_set_lossfunction.py:97)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, class_weights=True, output_exporters=[])
    trainer.set_lossfunction(loss_nn.MultiLabelMarginLoss)
    with pytest.raises(ValueError, match="weighted"):
        trainer.train(nepoch=1, batch_size=4, filename=None)


def test_bce_rejected_at_training(classif_trainer) -> None:
    """BCE losses pass the whitelist but are rejected when building the step
    (reference _format_output parity, trainer.py:813-819)."""
    classif_trainer.set_lossfunction(loss_nn.BCELoss)
    with pytest.raises(ValueError, match="not supported"):
        classif_trainer._build_step_functions()


def test_untested_classification_loss_rejected(classif_trainer) -> None:
    classif_trainer.set_lossfunction(loss_nn.KLDivLoss)
    with pytest.raises(ValueError, match="not supported"):
        classif_trainer._build_step_functions()
