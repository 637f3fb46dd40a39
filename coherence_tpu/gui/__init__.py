"""Windowing, wire protocol, transport and the interactive engine.

Parity: reference layers 6-8 (wxgui.ml, camlpy.ml, pytalk.ml, main.py,
mltalk.py, pycaml.py, engine.ml).  The reference splits the renderer and the
GUI into two processes joined by a custom TCP protocol; here one Python
process hosts both by default (events are plain method calls), and the wire
protocol + TCP transport are kept as an optional remote-display backend with
the same frame format, port negotiation and synchronous-RPC semantics.
"""
