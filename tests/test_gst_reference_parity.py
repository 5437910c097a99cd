"""Reference-parity fixtures for the GST OCR-noise paths (P19/P20/P21) and
the annexure parser (P25-P27).

Every expected value in this file was derived by EXECUTING the reference
implementation (`/root/reference/project/core/extractors/gst_certi.py`)
side-by-side with the oracle during development; the reference is NOT
imported at test time (the repo stays standalone). Cases fall in two
groups:

* **exact-parity pins** — oracle output byte-equals the reference's,
  including its quirks (e.g. the building/flat label regex requiring a
  trailing-whitespace lookahead, so an end-of-string value yields {});
* **documented divergences** — where the oracle deliberately differs, the
  reference's measured output is recorded in the comment. Both divergences
  are long-standing and documented at the implementation site:
  1. OCR-fix idempotence guard (`oracle/gst.py:_apply_ocr_fixes`): the
     reference re-applies truncation fixes to already-correct values,
     mangling "Gujarat" -> "GGujarat" and "Ahmedabad" -> "AhmAhmedabad"
     (`gst_certi.py:184-195`), which then breaks its own downstream
     city/state word-boundary regexes.
  2. Annexure numbered-entry split (`oracle/gst.py:parse_annexure_addresses`):
     the reference's `^\\d+$` separator branch (`gst_certi.py:1205-1214`) is
     dead code — the `len(line) < 3` and all-non-alpha filters
     (`gst_certi.py:1188,1199-1202`) swallow every digit marker first, so
     all entries concatenate into one address. The oracle tests the
     separator first, making the per-entry split and the 20-address cap
     functional.
"""

from __future__ import annotations

from ocr_automation_system_spark.oracle import gst


class TestFragmentedLabelParity:
    """P19+P20 pins — oracle == reference on every case."""

    def test_multiline_locality_with_following_label(self):
        out = gst.extract_labeled_address_fields(
            "Locality\nSub\nLocal\n:\nBodakdev\nCity:\nAhmedabad")
        # reference: city pattern's lookahead needs a following label or
        # trailing space, so only locality survives — parity-pinned.
        assert out == {"locality": "Bodakdev"}

    def test_road_street_and_fragmented_pin(self):
        out = gst.extract_labeled_address_fields(
            "Road\nStreet\n:\nRing Road\nPIN\nCode\n:\n380054")
        assert out == {"road_street": "Ring Road", "pin_code": "380054"}

    def test_city_town_village_truncation(self):
        out = gst.extract_labeled_address_fields(
            "City\nTown\nVillage:\nMehsana\nDistrict:\nMehsana")
        # district value sits at end-of-string -> lookahead fails (ref quirk)
        assert out == {"city": "Mehsana"}

    def test_five_digit_truncated_pin_accepted(self):
        out = gst.extract_labeled_address_fields("State:\nGujrat\nPIN Cod: 88001")
        # "Gujrat" -> "Gujarat" via the OCR-fix table (both engines);
        # truncated "PIN Cod" label and 5-digit pin accepted (ref parity).
        assert out == {"state": "Gujarat", "pin_code": "88001"}

    def test_value_at_end_of_string_yields_nothing(self):
        # ref quirk pin: building pattern lookahead requires \s+ before $,
        # so a value flush against end-of-string never matches.
        assert gst.extract_labeled_address_fields(
            "Building\nNo./Flat\nNo.:\n903-918") == {}
        assert gst.extract_labeled_address_fields(
            "Name\nof\nPremises\n/\nBuilding\n:\nKONCEM TOWER") == {}

    def test_bare_label_without_colon_not_a_field(self):
        assert gst.extract_labeled_address_fields("state\nGujarat") == {}

    def test_ocr_fix_idempotence_divergence(self):
        # documented divergence #1: reference produces 'GGujarat' here
        # ("viarat"->"Gujarat", then "ujarat" fires again inside the fix).
        out = gst.extract_labeled_address_fields("State:\nviarat\nPIN Code: 380015")
        assert out == {"state": "Gujarat", "pin_code": "380015"}
        # and 'AhmAhmedabad' for an already-correct city ("edabad" refix):
        out2 = gst.extract_labeled_address_fields(
            "District: Ahmedabad State: Gujarat PIN Code: 380009")
        assert out2["district"] == "Ahmedabad"


class TestTokenStructuringParity:
    """P21 pins. Where the dict below adds state/city keys over the
    reference's output, the delta is exactly divergence #1 (the reference
    mangles the state/city token before its own regex can see it)."""

    def test_fp_tp_tokens_and_used_index_bookkeeping(self):
        out = gst.structure_principal_address(
            "F.P. 123, T.P. 45, Sardar Chowk, Kadi, Gujarat 382715")
        # F.P. consumed as building; T.P. left for locality (first-leftover);
        # reference == this minus {'state'} (its "Gujarat" self-mangles).
        assert out == {
            "pin_code": "382715", "state": "Gujarat", "city": "Kadi",
            "district": "Kadi", "building_flat_no": "F.P. 123",
            "road_street": "Sardar Chowk", "locality": "T.P. 45",
        }

    def test_full_comma_chain_exact_reference_match(self):
        # byte-equal to the reference (no fix-table token present).
        out = gst.structure_principal_address(
            "Flat No - 22, Heights Residency, Lane 4, Behind Temple, "
            "Pune, Maharashtra, 411001")
        assert out == {
            "pin_code": "411001", "state": "Maharashtra", "city": "Pune",
            "district": "Pune", "building_flat_no": "Flat No - 22",
            "premises_name": "Heights Residency", "road_street": "Lane 4",
            "nearby_landmark": "Behind Temple",
        }

    def test_multiword_state_and_out_of_order_tokens(self):
        # byte-equal to the reference: "Tamil Nadu" matched as state, city
        # copied to district, leftovers classified by indicator words.
        out = gst.structure_principal_address(
            "Tamil Nadu, Chennai, 600001, Anna Salai, Tower B")
        assert out == {
            "pin_code": "600001", "state": "Tamil Nadu", "city": "Chennai",
            "district": "Chennai", "premises_name": "Tower B",
            "locality": "Anna Salai",
        }

    def test_no_indicators_everything_is_locality(self):
        # byte-equal to the reference.
        out = gst.structure_principal_address(
            "just some words without anything useful")
        assert out == {"locality": "just some words without anything useful"}

    def test_duplicate_indicator_tokens_first_wins(self):
        # "plot no 1" claims building; "plot no 2" falls through to
        # locality (used-index bookkeeping); ref == this minus state/city.
        out = gst.structure_principal_address(
            "plot no 1, plot no 2, ahmedabad, gujarat")
        assert out["building_flat_no"] == "plot no 1"
        assert out["locality"] == "plot no 2"


class TestAnnexureParity:
    def test_company_name_and_for_noise_filtered(self):
        # documented divergence #2: reference returns ONE concatenated
        # address (its digit separators are dead code); the oracle splits
        # per numbered entry. The company-name lines, "FOR, <company>"
        # block, GSTIN and header noise are filtered identically.
        text = ("Legal Name\nSTELLAR NOVA PRIVATE LIMITED\n"
                "Trade Name, if any\nSTELLAR TRADERS\n"
                "Annexure A\nDetails of Additional Places of Business\n"
                "GSTIN\n24ABCDE1234F1Z5\n"
                "1\nSTELLAR NOVA PRIVATE LIMITED\n"
                "Plot No 96, Phase Two,\nAhmedabad, Gujarat, 382445\n"
                "2\nFOR, STELLAR NOVA PRIVATE LIMITED,\nAuthorised Director\n"
                "Survey No 210, GIDC Road,\nVadodara, Gujarat, 390010")
        assert gst.parse_annexure_addresses(text) == [
            "Plot No 96, Phase Two, Ahmedabad, Gujarat, 382445",
            "Survey No 210, GIDC Road, Vadodara, Gujarat, 390010",
        ]

    def test_unnumbered_address_via_looks_like_address(self):
        # byte-equal to the reference (single unnumbered entry).
        assert gst.parse_annexure_addresses(
            "Annexure A\nPlot No 5, Ring Road,\nAhmedabad, Gujarat, 380054"
        ) == ["Plot No 5, Ring Road, Ahmedabad, Gujarat, 380054"]

    def test_gibberish_and_long_digit_lines_dropped(self):
        # byte-equal to the reference: "ab" (len<3), "##@@" (non-alpha),
        # trailing 12-digit line all dropped.
        assert gst.parse_annexure_addresses(
            "Annexure A\n1\nab\n##@@\nPlot No 9, Lane 2,\n"
            "Rajkot, Gujarat, 360001\n123456789012"
        ) == ["Plot No 9, Lane 2, Rajkot, Gujarat, 360001"]


class TestAnnexureStripLiteralGate:
    """The required-literal gate on the 18-pass noise strip must be a pure
    optimization: byte-identical to the ungated sequential strip on any
    input, including the cascade cases where later patterns consume
    residue earlier passes create."""

    @staticmethod
    def _ungated(text):
        for pat in gst._ANNEXURE_NOISE:
            text = pat.sub(" ", text)
        return text

    CASCADES = [
        # pattern 3's sub creates pattern 10's match
        "total number of additional places of business(s) in the state",
        # pattern 5's sub creates pattern 11's match ("sr.  no.")
        "sr. gstin no.",
        "plot 7, survey no 12, details of additional place of business",
        "FOR, ACME WIDGETS PRIVATE LIMITED,\nAuthorised / Director",
        "legal name\nACME LTD\ntrade name, if any\nACME",
        "Annexure - A\n1\n12 MG Road, Bengaluru 560001\n2\n9 Park St",
        "24AAACB1234A1Z5 serial no. 3 address: 5 Ring Rd",
        "s. no. total number of (s) in the state",
        "",
        "   \n\n  ",
        "no gate literals here at all — plain address text 560001",
    ]

    def test_annexure_strip_literal_gate_exact(self):
        for text in self.CASCADES:
            assert gst._strip_annexure_noise(text) == self._ungated(text), text

    def test_annexure_strip_literal_gate_fuzz(self):
        """Hypothesis sweep over adversarial compositions of pattern
        fragments, separators and case — the gate must never change a
        byte."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        frags = st.sampled_from([
            "annexure a", "details of", "additional places of business",
            "gstin", "legal name", "trade name", "if any", "total number of",
            "(s) in the state", "sr.", "s.", "no.", "serial", "address",
            "for,", "pvt ltd", "private limited", "llp",
            "authorised / director", "24AAACB1234A1Z5", "MG Road 560001",
            "xyzzy", "12", " ", "\n",
        ])
        texts = st.lists(frags, min_size=0, max_size=12).map(" ".join)

        @settings(max_examples=300, deadline=None)
        @given(texts, st.booleans())
        def check(text, upper):
            if upper:
                text = text.upper()
            assert gst._strip_annexure_noise(text) == self._ungated(text)

        check()
