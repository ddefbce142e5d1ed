"""Golden test: torchvision-naming ResNet-18 state dict → flax, numerical
parity with a torch forward (the reference's MNIST metric classifier path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siss_tpu.models.resnet import ResNet, load_torch_resnet  # noqa: E402


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TorchResNet18(tnn.Module):
    """torchvision-naming ResNet-18 (grayscale, 7x7 stem + maxpool) — the
    reference's metric classifier architecture."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            blocks = []
            for j in range(2):
                s = stride if j == 0 else 1
                down = None
                if s != 1 or inplanes != planes:
                    down = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes, 1, s, bias=False),
                        tnn.BatchNorm2d(planes))
                blocks.append(TorchBasicBlock(inplanes, planes, s, down))
                inplanes = planes
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


@pytest.mark.slow
def test_torch_resnet18_import_parity():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    # randomize batchnorm running stats so the import is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    fmodel = ResNet(stage_sizes=(2, 2, 2, 2), num_classes=10, grayscale=True,
                    small_input=False)
    variables = load_torch_resnet(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, fmodel)

    x = np.random.default_rng(0).normal(size=(2, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()
    f_out = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(f_out), t_out, rtol=2e-3, atol=2e-4)
