"""Unit tests for the per-doctype oracle extractors (SURVEY.md §2.3-2.4),
with adversarial inputs derived from reference edge cases."""

from ocr_automation_system_spark.oracle.doctype import detect_document_type, extract_document
from ocr_automation_system_spark.oracle import gst, pan, udyam


class TestPan:
    COMPANY_TEXT = (
        "INCOME TAX DEPARTMENT GOVT. OF INDIA\n"
        "PERMANENT ACCOUNT NUMBER CARD\n"
        "ABFCS7205N\n"
        "STELLINOX STAINLESS PRIVATE LIMITED XK3\n"
        "DATE OF INCORPORATION\n"
        "15/03/2019\n"
    )

    def test_company_extraction(self):
        rec = pan.extract_pan_fields(self.COMPANY_TEXT)
        f = rec["fields"]
        assert f["pan"] == "ABFCS7205N"
        assert f["pan_type"] == "COMPANY"
        # suffix cleanup truncates trailing noise after "PRIVATE LIMITED"
        assert f["name"] == "STELLINOX STAINLESS PRIVATE LIMITED"
        assert f["incorporation_date"] == "15/03/2019"
        assert rec["missing_fields"] == []

    def test_person_after_pan(self):
        text = "INCOME TAX DEPARTMENT\nABCPX1234K\nRAMESH KUMAR PATEL\n01/01/1990\n"
        rec = pan.extract_pan_fields(text)
        assert rec["fields"]["pan_type"] == "PERSON"
        assert rec["fields"]["name"] == "RAMESH KUMAR PATEL"

    def test_person_before_pan_fallback(self):
        text = "RAMESH KUMAR PATEL\nABCPX1234K\nFATHER NAME\nSURESH PATEL\n"
        rec = pan.extract_pan_fields(text)
        assert rec["fields"]["name"] == "RAMESH KUMAR PATEL"

    def test_father_stop(self):
        # "FATHER" stops the after-PAN scan (`pan_card.py:66-68`)
        text = "ABCPX1234K\nFATHER OF SOMEONE\nRAMESH KUMAR PATEL\n"
        rec = pan.extract_pan_fields(text)
        assert "name" in rec["missing_fields"]

    def test_blacklist_rejected_as_name(self):
        text = "ABCPX1234K\nINCOME TAX DEPARTMENT\n"
        rec = pan.extract_pan_fields(text)
        assert "name" in rec["missing_fields"]

    def test_missing_pan(self):
        rec = pan.extract_pan_fields("no identifiers at all here")
        assert "pan" in rec["missing_fields"]
        assert sorted(rec["missing_fields"]) == rec["missing_fields"]

    def test_holder_type_map(self):
        assert pan.pan_holder_type("ABCPX1234K") == "PERSON"
        assert pan.pan_holder_type("ABCCX1234K") == "COMPANY"
        assert pan.pan_holder_type("ABCGX1234K") == "GOVERNMENT"
        assert pan.pan_holder_type("SHORT") is None

    def test_clean_company_name_priority(self):
        # "PRIVATE LIMITED" outranks "LIMITED" (`pan_card.py:191-197`)
        assert pan.clean_company_name("ACME PRIVATE LIMITED NOISE") == "ACME PRIVATE LIMITED"
        assert pan.clean_company_name("ACME LIMITED JUNK") == "ACME LIMITED"
        assert pan.clean_company_name("ACME CORP AB12") == "ACME CORP"

    def test_date_yyyy_first_variant(self):
        assert pan.extract_incorporation_date("DATE 2019/03/15 END") == "2019/03/15"


class TestGst:
    GST_TEXT = (
        "Form GST REG-06\n"
        "Registration Certificate\n"
        "Registration Number : 24ABFCS7205N1Z3\n"
        "1.\n"
        "Legal Name\n"
        "STELLINOX STAINLESS PRIVATE LIMITED\n"
        "2.\n"
        "Trade Name\n"
        "STELLINOX TRADERS\n"
        "3.\n"
        "Constitution of Business\n"
        "Private Limited Company\n"
        "4.\n"
        "Address of Principal Place of\n"
        "Business\n"
        "Building No./Flat No.: B-12\n"
        "Name of Premises/Building: Koncem Tower\n"
        "Road/Street: Ring Road\n"
        "City/Town/Village: Ahmedabad\n"
        "District: Ahmedabad\n"
        "State: Gujarat\n"
        "PIN Code: 380015\n"
        "5.\n"
        "Date of Liability\n"
        "01/07/2017\n"
        "Total Number of Additional Places of Business in the State: 2\n"
        "9.\n"
        "Gujarat Goods and Services Tax Act, 2017\n"
        "Annexure A\n"
        "Details of Additional Places of Business\n"
        "1\n"
        "Plot No 96, Phase Two Industrial Estate,\n"
        "Ahmedabad, Gujarat, 382445\n"
        "2\n"
        "Survey No 210, GIDC Estate Road,\n"
        "Vadodara, Gujarat, 390010\n"
    )

    def test_full_record(self):
        rec = gst.extract_gst_fields(self.GST_TEXT)
        f = rec["fields"]
        assert f["gst_number"] == "24ABFCS7205N1Z3"
        assert f["name"] == "STELLINOX STAINLESS PRIVATE LIMITED"
        assert f["constitution_of_business"] == "Private Limited"
        assert f["principal_address"]["pin_code"] == "380015"
        assert f["principal_address"]["city"] == "Ahmedabad"
        assert f["principal_address"]["building_flat_no"] == "B-12"
        assert f["total_no_of_additional_places"] == "2"
        assert "Plot No 96" in f["additional_place_of_business"]
        assert "Survey No 210" in f["additional_place_of_business"]
        assert "Goods and Services Tax Act" in f["particulars_of_approving_authority"]
        assert rec["missing_fields"] == []

    def test_zero_places_gives_na(self):
        text = self.GST_TEXT.replace("in the State: 2", "in the State: 0")
        rec = gst.extract_gst_fields(text)
        assert rec["fields"]["additional_place_of_business"] == "NA"

    def test_leading_zero_strip(self):
        # `gst_certi.py:44`: "02" -> "2"
        text = self.GST_TEXT.replace("in the State: 2", "in the State: 02")
        rec = gst.extract_gst_fields(text)
        assert rec["fields"]["total_no_of_additional_places"] == "2"

    def test_gstin_labeled_fallback(self):
        assert gst.extract_gst_number("GSTIN: 24ABFCS7205N1Z3 listed") == "24ABFCS7205N1Z3"

    def test_gstin_validation(self):
        assert gst.validate_gstin("24ABFCS7205N1Z3") == "24ABFCS7205N1Z3"
        assert gst.validate_gstin("24ABFCS7205N1X3") == ""  # 14th char must be Z
        assert gst.validate_gstin("SHORT") == ""

    def test_constitution_chain_order(self):
        # "private" + "limit" outranks "company" (`gst_certi.py:826-845`)
        assert gst.normalize_constitution("Private Limited Company") == "Private Limited"
        assert gst.normalize_constitution("Limited Liability Partnership") == "LLP"
        assert gst.normalize_constitution("general partnership") == "Partnership"
        assert gst.normalize_constitution("unknown thing") == ""

    def test_fragment_merge(self):
        merged = gst.merge_fragmented_lines("Floor\nNo.:\n9TH")
        assert "Floor No.: 9TH" in merged

    def test_labeled_fields_from_fragments(self):
        fields = gst.extract_labeled_address_fields("Floor\nNo.:\n9TH\nPIN Code: 380015")
        assert fields["floor_no"] == "9TH"
        assert fields["pin_code"] == "380015"

    def test_ocr_fix_dictionary(self):
        fields = gst.extract_labeled_address_fields("State: viarat\nPIN Code: 380015")
        assert fields["state"] == "Gujarat"

    def test_token_based_structuring(self):
        addr = gst.structure_principal_address(
            "Plot No 5, Galaxy Complex, Ring Road, Nr. Aria Hotel, Bodakdev, Ahmedabad, Gujarat, 380054"
        )
        assert addr["building_flat_no"] == "Plot No 5"
        assert addr["premises_name"] == "Galaxy Complex"
        assert addr["road_street"] == "Ring Road"
        assert addr["nearby_landmark"] == "Nr. Aria Hotel"
        assert addr["locality"] == "Bodakdev"
        assert addr["city"] == "Ahmedabad"
        assert addr["district"] == "Ahmedabad"
        assert addr["state"] == "Gujarat"
        assert addr["pin_code"] == "380054"

    def test_annexure_cap_at_20(self):
        entries = []
        for i in range(1, 30):
            entries += [str(i), f"Plot No {i}, Industrial Road,", f"Ahmedabad, Gujarat, 38{i:04d}"]
        text = "Annexure A\n" + "\n".join(entries) + "\n"
        addresses = gst.parse_annexure_addresses(text)
        assert len(addresses) == 20  # `gst_certi.py:1230`

    def test_normalize_text_order(self):
        # control-strip, then tab collapse, then blank-line drop (P34)
        assert gst.normalize_text("a\x01b\t\tc\n\n  d  \n") == "ab c\nd"

    def test_noise_predicates(self):
        assert gst.is_noise("1234")
        assert not gst.is_noise("382445")  # 6-digit PIN is NOT noise
        assert gst.is_noise("yes")
        assert gst.is_header_noise("Legal Name")
        assert gst.contains_form_noise("FORM GST REG-06 header")

    def test_noise_union_equivalence(self):
        """The union-alternation fast path must be boolean-equivalent to
        the per-pattern loop on every input (pure existence test)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        probes = [
            "", " ", "yes", "NO", "nil", "na", "1234", "12345", "page 3",
            "7 .", "Legal Name", "trade name, if any", "FORM GST",
            "Government of India", "see rule 18(1)", "Details of",
            "Principal Place", "Address of", "!!!", "a", "GSTIN",
            "registration certificate line", "x" * 200, "382445 road",
        ]

        def loop_noise(line):
            if not line or len(line) < 2:
                return True
            return any(p.match(line) for p in gst._NOISE_RES)

        def loop_header(line):
            return any(p.search(line) for p in gst._HEADER_NOISE_RES)

        for s in probes:
            assert gst.is_noise(s) == loop_noise(s), repr(s)
            assert gst.is_header_noise(s) == loop_header(s), repr(s)

        @settings(max_examples=300, deadline=None)
        @given(st.text(min_size=0, max_size=60))
        def fuzz(s):
            assert gst.is_noise(s) == loop_noise(s)
            assert gst.is_header_noise(s) == loop_header(s)

        fuzz()

    def test_empty_input(self):
        rec = gst.extract_gst_fields("")
        assert len(rec["missing_fields"]) == 7

    # -- P19 fragment-merge edge cases (`gst_certi.py:56-123` semantics,
    # hand-walked against the reference state machine) ---------------------
    def test_merge_colon_at_end_pulls_value_line(self):
        # "No./Flat" is NOT a label part (composite token), so it is taken
        # as the value and found_value flips — the later bare "No.:" IS a
        # part and still appends, then the loop breaks at "903-918".
        got = gst.merge_fragmented_lines(
            "Building\nNo./Flat\nNo.:\n903-918\nRoad\nStreet:\nMG ROAD")
        assert got == "Building No./Flat No.:\n903-918\nRoad Street: MG ROAD"

    def test_merge_breaks_only_on_bare_label_start(self):
        # "City: Rajkot" is not a BARE label line (value attached), so the
        # break-on-next-label rule does not fire; it merges as the value.
        assert gst.merge_fragmented_lines("Floor\nCity: Rajkot") \
            == "Floor City: Rajkot"

    def test_merge_seven_line_lookahead_cap(self):
        got = gst.merge_fragmented_lines(
            "Floor\nno\nno\nno\nno\nno\nno\nno\n9TH")
        assert got == "Floor no no no no no no no\n9TH"

    def test_merge_value_without_colon(self):
        assert gst.merge_fragmented_lines("Pin\nCode\n382445") \
            == "Pin Code 382445"

    def test_merge_never_swallows_label_start_as_value(self):
        assert gst.merge_fragmented_lines("Floor\nNo.:\nState") \
            == "Floor No.:\nState"

    # -- P20 labeled-field edge cases (`gst_certi.py:126-200`) -------------
    def test_labeled_fields_full_chain_with_ocr_fixes(self):
        got = gst.extract_labeled_address_fields(
            "Floor No.: 9TH Building No./Flat No.: 903-918 "
            "Name of Premises/Building: KONCEM TOWER Road/Street: ASHRAM ROAD "
            "City: edabad State: viarat PIN Code: 380009")
        assert got == {
            "floor_no": "9TH", "building_flat_no": "903-918",
            "premises_name": "KONCEM TOWER", "road_street": "ASHRAM ROAD",
            "city": "Ahmedabad", "state": "Gujarat", "pin_code": "380009",
        }

    def test_labeled_fields_truncated_labels_and_5digit_pin(self):
        got = gst.extract_labeled_address_fields(
            "Flat No.: D-1 Road: Ring Road Landmark: Near aria Restaurant "
            "Locality: Navrangpura City/Town/Vi: Rajkot District: Rajkot "
            "State: Gujrat Pin Cod: 88001")
        assert got["building_flat_no"] == "D-1"      # flat-> same key
        assert got["nearby_landmark"] == "Near aria Restaurant"
        assert got["locality"] == "Navrangpura"
        assert got["city"] == "Rajkot"
        assert got["state"] == "Gujarat"             # Gujrat OCR fix
        assert got["pin_code"] == "88001"            # truncated 5-digit pin

    def test_labeled_fields_terminator_requires_trailing_token(self):
        # The value lookahead needs "\\s+(label|$)" AFTER the value; a value
        # flush at end-of-string has no trailing whitespace, so state/city
        # at EOF do NOT match — and "No." survives the embedded-fragment
        # strip because \\bNo\\.\\b has no boundary before a space.
        got = gst.extract_labeled_address_fields(
            "Building No.: 12 No. Business State: Ahmedabad edabad")
        assert got == {"building_flat_no": "12 No."}

    # -- annexure edge cases (`gst_certi.py:1108-1230`) --------------------
    ANNEXURE = (
        "Annexure A\n"
        "Details of Additional Places of Business\n"
        "GSTIN 24ABCDE1234F1Z5\n"
        "Legal Name\nACME WIDGETS PRIVATE LIMITED\n"
        "Trade Name, if any\nACME\n"
        "1\nPlot 45, GIDC Estate\nPhase II, Vatva\nAhmedabad 382445\n"
        "2\nACME WIDGETS PRIVATE LIMITED\n"
        "Survey No 88, Ring Road\nRajkot 360001 xy\n"
        "Signature"
    )

    def test_annexure_company_lines_filtered_and_pin_tail_trimmed(self):
        got = gst.extract_additional_places(self.ANNEXURE)
        addrs = got.split("\n\n")
        assert addrs[0] == "Plot 45, GIDC Estate, Phase II, Vatva, Ahmedabad 382445"
        # company line dropped from entry 2; "xy" after the PIN trimmed
        # (short trailing, no road-word)
        assert addrs[1] == "Survey No 88, Ring Road, Rajkot 360001"

    def test_annexure_zero_count_early_out(self):
        txt = ("Annexure A\nTotal Number of Additional Places of "
               "Business(s) in the State 0\nsome other text making it "
               "longer than thirty characters")
        assert gst.extract_additional_places(txt) == ""

    # -- P21 token-structuring edge cases (`gst_certi.py:203-396`) ---------
    def test_token_fallback_city_implies_district(self):
        got = gst.structure_principal_address(
            "Plot No - 45, GIDC Estate, Near Water Tank, Vatva, "
            "Ahmedabad, Gujarat 382445")
        assert got["city"] == "Ahmedabad" and got["district"] == "Ahmedabad"
        assert got["building_flat_no"] == "Plot No - 45"
        assert got["nearby_landmark"] == "Near Water Tank"
        # Reference quirk preserved (`gst_certi.py:255` strips the label
        # r"State\s*:?" with NO word boundary): "GIDC Estate" loses its
        # embedded "state" and becomes "GIDC E".
        assert got["locality"] == "GIDC E"
        assert got["pin_code"] == "382445" and got["state"] == "Gujarat"

    def test_token_fallback_orissa_synonym_and_shop_prefix(self):
        got = gst.structure_principal_address(
            "Shop No: 3, Main Road, Cuttack, Orissa, 753001")
        assert got == {"pin_code": "753001", "state": "Orissa",
                       "city": "Cuttack", "district": "Cuttack",
                       "building_flat_no": "Shop No: 3",
                       "road_street": "Main Road"}

    def test_token_fallback_fp_tp_classifiers_no_city(self):
        got = gst.structure_principal_address(
            "F.P. 120, T.P. 14, Industrial Zone, 500081, Telangana")
        assert got["building_flat_no"] == "F.P. 120"
        assert "city" not in got and "district" not in got

    def test_empty_labeled_values_fall_back_to_pin_state_only(self):
        # Reference quirk preserved (`gst_certi.py:219`): ":\\s*\\S+"
        # matches ": ," so the labeled path is taken, its extractors all
        # fail on empty values, and only the PIN/state fallbacks fire —
        # the city list is never consulted (Mehsana stays unassigned).
        got = gst.structure_principal_address(
            "Building No./Flat No.: , Road/Street: , Mehsana, Gujarat 384002")
        assert got == {"pin_code": "384002", "state": "Gujarat"}

    def test_annexure_b_terminates_scope(self):
        txt = ("Annexure A\n1\nPlot 45, GIDC Industrial Estate Road, Vatva\n"
               "Ahmedabad 382445\nAnnexure B\n2\n"
               "Should Not Appear Street, Rajkot 360001")
        got = gst.extract_additional_places(txt)
        assert got == "Plot 45, GIDC Industrial Estate Road, Vatva, Ahmedabad 382445"
        assert "Should Not Appear" not in got


class TestUdyam:
    UDYAM_TEXT = (
        "UDYAM REGISTRATION CERTIFICATE\n"
        "UDYAM REGISTRATION NUMBER UDYAM-GJ-01-0090271\n"
        "NAME OF ENTERPRISE : STELLINOX STAINLESS PRIVATE LIMITED\n"
        "PAN ABFCS7205N\n"
        "ENTERPRISE TYPE CLASSIFICATION\n"
        "1 2021-22 MICRO 15/07/2021\n"
        "2 2022-23 SMALL 20/07/2022\n"
        "EMPLOYMENT DETAILS MALE FEMALE OTHER TOTAL 12 5 1 18\n"
        "UNIT(S) DETAILS\n"
        "1 M/S STELLINOX STAINLESS FLAT : 12 GALAXY HOUSE AHMEDABAD NAVRANGPURA "
        "RING ROAD 380015 GUJARAT AHMEDABAD\n"
        "OFFICIAL ADDRESS OF ENTERPRISE\n"
        "FLAT/DOOR/BLOCK NO. 45-B NAME OF PREMISES/BUILDING GALAXY HOUSE "
        "VILLAGE/TOWN AHMEDABAD BLOCK NAVRANGPURA ROAD/STREET/LANE RING ROAD "
        "CITY AHMEDABAD STATE GUJARAT DISTRICT AHMEDABAD , PIN : 380015\n"
        "MOBILE 9876543210 EMAIL : INFO@STELLINOX.COM\n"
        "DATE OF INCORPORATION 15/03/2019\n"
        "DATE OF COMMENCEMENT 15/03/2019\n"
        "BANK DETAILS BANK NAME IFS CODE BANK ACCOUNT NUMBER STATE BANK HDFC0001234 123456789012\n"
        "NATIONAL INDUSTRY CLASSIFICATION CODE(S)\n"
        "1 23 - MANUFACTURE OF OTHER PRODUCTS 2393 - MANUFACTURE OF CERAMIC "
        "23931 - MANUFACTURE OF CERAMIC ARTICLES MANUFACTURING\n"
    )

    def test_scalar_fields(self):
        rec = udyam.extract_udyam_fields(self.UDYAM_TEXT)
        f = rec["fields"]
        assert f["udyam_number"] == "UDYAM-GJ-01-0090271"
        assert f["enterprise_name"] == "STELLINOX STAINLESS PRIVATE LIMITED"
        assert f["pan"] == "ABFCS7205N"
        assert f["mobile"] == "9876543210"
        assert f["email"] == "INFO@STELLINOX.COM"
        assert f["incorporation_date"] == "15/03/2019"
        assert rec["missing_fields"] == []

    def test_equal_dates_flag(self):
        rec = udyam.extract_udyam_fields(self.UDYAM_TEXT)
        assert rec["flags"] == [{"code": "INCORPORATION_EQUALS_COMMENCEMENT", "severity": "HIGH"}]

    def test_classification_table(self):
        rows = udyam.extract_classification_table(self.UDYAM_TEXT.upper())
        assert [r["enterprise_type"] for r in rows] == ["MICRO", "SMALL"]
        assert rows[0]["classification_year"] == "2021-22"

    def test_employment_table(self):
        emp = udyam.extract_employment_table(self.UDYAM_TEXT.upper())
        assert emp == {"male": 12, "female": 5, "other": 1, "total": 18}

    def test_units_table(self):
        rows = udyam.extract_units_table(self.UDYAM_TEXT.upper())
        assert len(rows) == 1
        assert rows[0]["pin"] == "380015"
        assert rows[0]["state"] == "GUJARAT"
        assert rows[0]["unit_name"].startswith("M/S STELLINOX")

    def test_nic_dedup_first_wins(self):
        text = self.UDYAM_TEXT.upper() + (
            "2 24 - OTHER SECTOR 2499 - OTHER THINGS 23931 - DUPLICATE CODE SERVICE\n"
        )
        rows = udyam.extract_nic_table(text)
        codes = [r["nic_5_digit"] for r in rows]
        assert len(codes) == 1  # dedup on 5-digit code, first occurrence wins
        assert "CERAMIC" in codes[0]

    def test_bank_details(self):
        bank = udyam.extract_bank_details(self.UDYAM_TEXT.upper())
        assert bank["ifsc_code"] == "HDFC0001234"
        assert bank["account_number"] == "123456789012"

    def test_official_address(self):
        addr = udyam.extract_official_address(self.UDYAM_TEXT.upper())
        assert addr["flat_no"] == "45-B"
        assert addr["city"] == "AHMEDABAD"
        assert addr["state"] == "GUJARAT"
        assert addr["pin"] == "380015"

    def test_typo_header_matched(self):
        # `OFFIC[AI]AL` also matches the OCR-misread "OFFICAAL" variant
        text = self.UDYAM_TEXT.upper().replace("OFFICIAL ADDRESS", "OFFICAAL ADDRESS")
        assert udyam.extract_official_address(text).get("pin") == "380015"


class TestDoctypeDispatch:
    def test_detection_priority(self):
        assert detect_document_type("UDYAM-GJ-01-0090271 and PAN ABFCS7205N") == "UDYAM"
        assert detect_document_type("24ABFCS7205N1Z3") == "GST_CERTIFICATE"
        assert detect_document_type("just ABFCS7205N") == "PAN"
        assert detect_document_type("nothing here") == "UNKNOWN"

    def test_poison_isolation(self):
        rec = extract_document("u1", b"%PDF-1.4 not synthetic")
        assert rec["doc_status"] == "poison"
        assert "NotImplementedError" in rec["error"]

    def test_empty_payload(self):
        assert extract_document("u2", b"")["doc_status"] == "unusable"
        assert extract_document("u3", None)["doc_status"] == "unusable"


def test_ocr_model_singleton_init_is_measured():
    """The per-worker OCR model cost is recorded, not asserted: after the
    first get_model() the module exposes the measured init wall-time, and
    repeat calls return the same singleton without re-timing."""
    import importlib

    from ocr_automation_system_spark.oracle import ocr_stub

    mod = importlib.reload(ocr_stub)  # fresh worker state
    m1 = mod.get_model()
    t1 = mod.MODEL_INIT_SECONDS
    assert t1 >= 0.0
    assert mod.get_model() is m1
    assert mod.MODEL_INIT_SECONDS == t1  # singleton: no second build
    # synthetic text pages always go through the deterministic recognizer
    out = mod.ocr_page("alpha\nbeta\ngamma")
    assert set(out.split("\n")) <= {"alpha", "beta", "gamma"}


def test_detect_document_type_single_scan_equivalence():
    """The combined-alternation detector must agree with the definitional
    four-scan priority cascade (Udyam > GST > PAN > UNKNOWN) on
    adversarial compositions: ids adjacent, embedded, out of priority
    order, lowercase, or absent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_automation_system_spark.oracle import doctype as d

    def four_scan(text):
        upper = text.upper()
        if d._UDYAM_ID.search(upper):
            return "UDYAM"
        if d._GSTIN_ID.search(upper) or d._GST_HEADER.search(upper):
            return "GST_CERTIFICATE"
        if d._PAN_ID.search(upper):
            return "PAN"
        return "UNKNOWN"

    frags = st.sampled_from([
        "UDYAM-GJ-01-1234567", "udyam-gj-01-1234567", "UDYAM1234X",
        "24AAACB1234A1Z5", "ABCDE1234F", "form gst reg-06",
        "Goods and Services Tax", "GOODS AND", "plain text", "560001",
        "X24AAACB1234A1Z5Y", "UDYAM-GJ-01-123456",  # boundary-broken ids
        " ", "-", "12",
    ])
    texts = st.lists(frags, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=400, deadline=None)
    @given(texts, st.sampled_from(["", " ", "Q", "7"]))
    def check(text, joiner):
        glued = text.replace(" ", joiner) if joiner != " " else text
        for t in (text, glued):
            assert d.detect_document_type(t) == four_scan(t), t

    check()
