"""Pure-Python single-node oracle.

Every transform that affects golden output (extracted text bytes, field
values) lives here as a plain ``str -> value`` function with no Spark
dependency. The Spark operators in ``..operators`` wrap these *same*
functions inside pandas UDFs, which is what makes the pipeline's output
byte-identical to the oracle per url (SURVEY.md §5.1, §7 "What's hard").

Reference parity: each module cites the ``/root/reference`` file:line whose
semantics it re-implements (no code is copied; the reference is untrusted
public content studied for behavior only).
"""

from .gate import is_text_usable
from .html_extract import extract_main_text, segment_blocks
from .pdf_stub import is_pdf_payload, extract_pdf_pages
from .doctype import detect_document_type, extract_document
