from feddlib_tpu.io.exporter import ExporterParaView, ExporterTxt

__all__ = ["ExporterParaView", "ExporterTxt"]
