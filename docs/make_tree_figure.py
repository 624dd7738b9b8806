"""Generate docs/tree_metaphor.png — the Eryn "tree" state metaphor.

The reference's roadmap lists "Produce image for tree metaphor"
(`/root/reference/docs/source/general/todos.rst`) and never ships one.
The metaphor: the sampler state is a forest — every (temperature, walker)
pair owns one TREE; each BRANCH is a model type with its own
dimensionality; each LEAF is one instance of that model (active or
dormant under reversible jump).

Run: python docs/make_tree_figure.py
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Circle, FancyBboxPatch


def draw_tree(ax, x0, y0, active, scale=1.0, label=None):
    """One walker's tree: trunk, two branches, leaves (filled = active)."""
    s = scale
    ax.plot([x0, x0], [y0, y0 + 0.9 * s], color="#6b4f2a", lw=3.2 * s)
    # two branches (model types)
    tips = []
    for dx, name_y in ((-0.55 * s, 1.35 * s), (0.55 * s, 1.35 * s)):
        ax.plot(
            [x0, x0 + dx],
            [y0 + 0.9 * s, y0 + name_y],
            color="#6b4f2a",
            lw=2.2 * s,
        )
        tips.append((x0 + dx, y0 + name_y))
    # leaves per branch
    for b, (tx, ty) in enumerate(tips):
        n_leaves = len(active[b])
        for i, on in enumerate(active[b]):
            ang = (i - (n_leaves - 1) / 2) * 0.55
            lx = tx + 0.38 * s * ang
            ly = ty + 0.30 * s - 0.10 * s * abs(ang)
            ax.add_patch(
                Circle(
                    (lx, ly),
                    0.11 * s,
                    facecolor="#2e7d32" if on else "#cfd8cf",
                    edgecolor="#1b5e20" if on else "#9aa79a",
                    lw=1.0,
                    zorder=5,
                )
            )
    if label:
        ax.text(x0, y0 - 0.28 * s, label, ha="center", fontsize=8, color="#444")


def main():
    fig, ax = plt.subplots(figsize=(9.2, 4.6), dpi=110)
    ax.set_xlim(-0.8, 12.2)
    ax.set_ylim(-0.9, 6.6)
    ax.axis("off")

    # three temperature rows (beta decreasing upward), three walkers each
    temps = [(0.0, r"$\beta = 1$  (cold: the posterior)"),
             (2.0, r"$\beta = 0.3$"),
             (4.0, r"$\beta \to 0$  (hot: the prior)")]
    leaf_patterns = [
        [[1, 1, 0], [1, 0]],
        [[1, 0, 0], [1, 1]],
        [[1, 1, 1], [0, 0]],
    ]
    for row, (y, blabel) in enumerate(temps):
        ax.add_patch(
            FancyBboxPatch(
                (-0.35, y - 0.55),
                11.2,
                1.95,
                boxstyle="round,pad=0.12",
                facecolor="#f3f6fb" if row % 2 else "#eef7ee",
                edgecolor="#c9d4e3",
                lw=1.0,
                zorder=0,
            )
        )
        ax.text(10.95, y + 0.55, blabel, fontsize=9, va="center", color="#333")
        for w in range(3):
            draw_tree(
                ax,
                1.2 + 3.1 * w,
                y,
                leaf_patterns[(row + w) % 3],
                scale=0.85,
                label=f"walker {w}" if row == 0 else None,
            )
        if row < len(temps) - 1:
            ax.annotate(
                "",
                xy=(9.55, y + 1.75),
                xytext=(9.55, y + 0.3),
                arrowprops=dict(arrowstyle="<->", color="#b5541c", lw=1.6),
            )
            if row == 0:
                ax.text(
                    9.7, y + 1.05, "temperature\nswaps", fontsize=8,
                    color="#b5541c", va="center",
                )

    ax.text(
        0.1, 6.45,
        "One TREE per (temperature, walker) — BRANCHES are model types, "
        "LEAVES are model instances\n(filled = active; reversible jump "
        "flips leaves on and off; arrays stay statically shaped)",
        fontsize=9.5, color="#222", va="top",
    )
    fig.tight_layout()
    out = __file__.replace("make_tree_figure.py", "tree_metaphor.png")
    fig.savefig(out, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
