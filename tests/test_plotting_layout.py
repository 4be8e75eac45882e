"""Golden-layout tests for the owned EffectFigure scaffolding (VERDICT r2 #1).

Two jobs:

1. Pin the panel geometry so the EffectFigure rewrite keeps (and future edits
   keep keeping) visual layout parity with the reference's effect figures:
   main panel at (0.2, 0.2, 0.75, 0.75), bottom marginal strip at
   (0.2, 0.05, 0.75, 0.15), left marginal strip at (0.08, 0.2, 0.12, 0.75)
   (reference geometry: /root/reference/oak/plotting_utils.py:154-155,191,
   315-316,349,354).

2. Guard against statement-level transplant: no contiguous run of >5
   normalized code lines in oak_tpu/plotting.py may match the reference's
   plotting_utils.py. Only runs where the reference checkout exists.
"""

import io
from pathlib import Path

import numpy as np
import pytest

from oak_tpu import plotting
from oak_tpu.kernels import OAKKernel
from oak_tpu.models import GPR

MAIN_RECT = (0.2, 0.2, 0.75, 0.75)
BOTTOM_RECT = (0.2, 0.05, 0.75, 0.15)
LEFT_RECT = (0.08, 0.2, 0.12, 0.75)


def _make_gpr(rng, num_dims=2, p0=None, p=None):
    n = 24
    X = rng.normal(size=(n, num_dims))
    if p0 is not None:
        for d, pd in enumerate(p0):
            if pd is not None:
                X[:, d] = (rng.uniform(size=n) < 1 - pd).astype(float)
    if p is not None:
        for d, pd in enumerate(p):
            if pd is not None:
                X[:, d] = rng.integers(0, len(pd), size=n).astype(float)
    y = (np.sin(2 * X[:, 0]) + 0.3 * X.sum(axis=1)).reshape(-1, 1)
    k = OAKKernel.create(num_dims=num_dims, max_interaction_depth=2,
                         p0=p0, p=p)
    return GPR.create(X, y, k, noise_variance=0.05)


def _positions(fig):
    return {tuple(np.round(ax.get_position().bounds, 6)) for ax in fig.axes}


def test_single_effect_layout(rng):
    m = _make_gpr(rng)
    fd = plotting.plot_single_effect(m, 0, covariate_name="x0", title="t")
    pos = _positions(fd.fig)
    assert MAIN_RECT in pos
    assert BOTTOM_RECT in pos
    # tick hygiene: the main panel's x labels are hidden (the strip has them)
    main = [a for a in fd.fig.axes
            if tuple(np.round(a.get_position().bounds, 6)) == MAIN_RECT][0]
    assert all(not t.get_visible() for t in main.get_xticklabels())
    bottom = [a for a in fd.fig.axes
              if tuple(np.round(a.get_position().bounds, 6)) == BOTTOM_RECT][0]
    assert bottom.get_xlabel() == "x0"
    assert list(bottom.get_yticks()) == []


def test_second_order_layout(rng):
    m = _make_gpr(rng)
    fd = plotting.plot_second_order(m, 0, 1, covariate_names=["a", "b"])
    pos = _positions(fd.fig)
    assert MAIN_RECT in pos
    assert BOTTOM_RECT in pos
    assert LEFT_RECT in pos
    left = [a for a in fd.fig.axes
            if tuple(np.round(a.get_position().bounds, 6)) == LEFT_RECT][0]
    # counts grow leftwards on the left marginal strip
    assert left.get_xlim()[0] > left.get_xlim()[1]
    assert left.get_ylabel() == "b"
    main = [a for a in fd.fig.axes
            if tuple(np.round(a.get_position().bounds, 6)) == MAIN_RECT][0]
    assert all(not t.get_visible() for t in main.get_xticklabels())
    assert all(not t.get_visible() for t in main.get_yticklabels())


def test_single_effect_renders(rng):
    """The figure actually renders (band + marks survive a draw)."""
    m = _make_gpr(rng)
    fd = plotting.plot_single_effect(m, 0, covariate_name="x0", title="t",
                                     plot_raw_data=True)
    buf = io.BytesIO()
    fd.fig.savefig(buf, format="png", dpi=40)
    assert buf.getbuffer().nbytes > 0


def test_binary_effect_smoke(rng):
    m = _make_gpr(rng, p0=[None, 0.4])
    fd = plotting.plot_single_effect_binary(m, 1, ["no", "yes"],
                                            covariate_name="flag")
    labels = {t.get_text() for ax in fd.fig.axes for t in ax.get_xticklabels()}
    assert {"no", "yes"} <= labels


def test_second_order_binary_layout(rng):
    m = _make_gpr(rng, p0=[None, 0.4])
    fd = plotting.plot_second_order_binary(m, 0, 1, ["no", "yes"],
                                           covariate_names=["a", "flag"])
    # two stacked band panels sharing x, plus one marginal strip
    pos = sorted(_positions(fd.fig))
    assert BOTTOM_RECT in pos
    mains = [p for p in pos if p != BOTTOM_RECT]
    assert len(mains) == 2
    assert mains[0][0] == mains[1][0] and mains[0][2] == mains[1][2]


def test_categorical_effect_smoke(rng):
    m = _make_gpr(rng, p=[None, np.array([0.3, 0.3, 0.4])])
    fd = plotting.plot_single_effect_categorical(m, 1, ["a", "b", "c"])
    labels = {t.get_text() for ax in fd.fig.axes for t in ax.get_xticklabels()}
    assert {"a", "b", "c"} <= labels
    assert fd.fig.axes[0].get_xlim() == (-1.0, 3.0)


REFERENCE = Path("/root/reference/oak/plotting_utils.py")


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not available")
def test_no_transplanted_statement_blocks():
    """No contiguous >5-line normalized statement sequence shared with the
    reference's plotting module (VERDICT r2 copy-paste finding)."""

    def normalized_lines(path):
        out = []
        for raw in Path(path).read_text().splitlines():
            line = raw.split("#", 1)[0].strip()
            if line:
                out.append(line)
        return out

    ours = normalized_lines(Path(plotting.__file__))
    theirs = normalized_lines(REFERENCE)
    # longest common contiguous run via dynamic programming over line hashes
    prev = [0] * (len(theirs) + 1)
    best = 0
    best_at = None
    for i, a in enumerate(ours):
        cur = [0] * (len(theirs) + 1)
        for j, b in enumerate(theirs):
            if a == b:
                cur[j + 1] = prev[j] + 1
                if cur[j + 1] > best:
                    best = cur[j + 1]
                    best_at = (i, j)
        prev = cur
    assert best <= 5, (
        f"shared {best}-line run ending at plotting.py line-index {best_at[0]}"
        f" / reference line-index {best_at[1]}: "
        + " | ".join(ours[best_at[0] - best + 1: best_at[0] + 1])
    )


def test_custom_main_rect_aligns_strips():
    """A custom main_rect keeps its marginal strips aligned to the main
    panel instead of the module-default rectangles (ADVICE r3): the bottom
    strip shares the main panel's x0/width, the left strip its y0/height."""
    rect = (0.3, 0.3, 0.6, 0.6)
    ef = plotting.EffectFigure(main_rect=rect)
    bottom = ef.bottom_hist(np.linspace(0, 1, 50), xlabel="x")
    left = ef.left_hist(np.linspace(0, 1, 50), ylabel="y")
    bx0, by0, bw, bh = bottom.get_position().bounds
    lx0, ly0, lw, lh = left.get_position().bounds
    assert (round(bx0, 6), round(bw, 6)) == (rect[0], rect[2])
    assert round(by0 + bh, 6) <= rect[1] + 1e-9  # sits under the main panel
    assert (round(ly0, 6), round(lh, 6)) == (rect[1], rect[3])
    assert round(lx0 + lw, 6) <= rect[0] + 1e-9  # sits left of the main panel

    # the default rect still reproduces the golden geometry exactly
    ef2 = plotting.EffectFigure()
    assert tuple(np.round(ef2._strip_rect("bottom"), 6)) == BOTTOM_RECT
    assert tuple(np.round(ef2._strip_rect("left"), 6)) == LEFT_RECT
