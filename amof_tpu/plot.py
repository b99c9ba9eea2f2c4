"""
Plot export helpers.

API parity with amof/plot.py: ``save_hvplot(plot, filename, format)``
:13-35 with 'svg+png' / 'svg' / 'png' outputs. hvplot/bokeh/cairosvg
belong to the reference's optional ``graphics`` extra
(pyproject.toml:45-51 there) and are imported lazily here; a matplotlib
figure fallback (``save_plot``) covers environments without them.
"""

from __future__ import annotations

import logging

import amof_tpu.files.path

logger = logging.getLogger(__name__)


def save_hvplot(plot, filename, format="svg+png"):
    """Save an hvplot/holoviews object (requires the graphics extras)."""
    try:
        import holoviews as hv
        import hvplot
        from bokeh.io import export_svg
    except ImportError as e:
        raise ImportError(
            "save_hvplot needs the optional graphics stack "
            "(hvplot/bokeh/cairosvg); use save_plot for matplotlib figures"
        ) from e

    if format[0:3] == "svg":
        output_filename = str(amof_tpu.files.path.append_suffix(filename, "svg"))
        bp = hv.render(plot)
        bp.output_backend = "svg"
        export_svg(bp, filename=output_filename)
        if format == "svg+png":
            from cairosvg import svg2png

            svg_code = open(output_filename, "rt").read()
            png_filename = str(
                amof_tpu.files.path.append_suffix(filename, "png")
            )
            svg2png(bytestring=svg_code, write_to=png_filename, scale=3)
    elif format == "png":
        output_filename = str(amof_tpu.files.path.append_suffix(filename, "png"))
        hvplot.save(plot, output_filename)
    else:
        raise ValueError("Format not supported")


def save_plot(fig, filename, format="png", dpi=300):
    """Save a matplotlib figure with suffix enforcement."""
    output = str(amof_tpu.files.path.append_suffix(filename, format))
    fig.savefig(output, dpi=dpi, bbox_inches="tight")
    return output
