"""ChartSQL SVG rendering (reference: sql/extensions/chartsql/ +
util/charts/).

The reference renders DRAW statements to SVG charts through a ~3 kLoC
chart library. Byte-exact SVG parity (golden test 00004) requires a
full port of that renderer's layout math; this module currently raises
until the renderer lands (tracked as a known gap).
"""

from eventql_tpu.core.errors import NotImplementedError_


def render_chart(node, txn) -> bytes:
    raise NotImplementedError_("DRAW chart rendering is not implemented yet")
