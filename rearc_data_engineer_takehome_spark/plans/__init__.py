"""Physical-plan inspection: assert pushdown / broadcast / top-k shapes."""
