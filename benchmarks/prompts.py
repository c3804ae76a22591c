"""Benchmark prompt sets: 8 length tiers, Hindi + English.

Plays the role of the reference's 22-prompt sweep corpus
(comprehensive_sweep.py:34-72: 6→460 chars in 8 tiers) and its 4
length-tiered perf prompts (benchmark.py:47-52). Original sentences —
the tier structure is the contract, not the text.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

# (prompt_id, text) — lengths grow tier by tier
SWEEP_PROMPTS: List[Tuple[str, str]] = [
    # tier 1: tiny (≤10 chars)
    ("tiny_1", "नमस्ते।"),
    ("tiny_2", "Hi there."),
    # tier 2: short greeting
    ("short_1", "आप कैसे हैं आज?"),
    ("short_2", "Welcome to the show."),
    ("short_3", "यह एक छोटा वाक्य है।"),
    # tier 3: one sentence
    ("sentence_1", "आज मौसम बहुत सुहावना है और धूप खिली हुई है।"),
    ("sentence_2", "The library opens at nine and closes after sunset."),
    ("sentence_3", "मुझे सुबह की चाय के साथ अख़बार पढ़ना पसंद है।"),
    # tier 4: two sentences
    ("medium_1", "कल हम बाज़ार गए थे। वहाँ बहुत भीड़ थी, लेकिन फल ताज़े और सस्ते मिले।"),
    ("medium_2", "She finished the report before lunch. Then she took a long "
                 "walk along the river to clear her mind."),
    ("medium_3", "ट्रेन समय पर आई और हम खिड़की के पास बैठ गए। बाहर के खेत हरे-भरे दिख रहे थे।"),
    # tier 5: short paragraph
    ("para_1", "पुराने शहर की गलियों में घूमते हुए हमें एक छोटी सी किताबों की दुकान मिली। "
               "दुकानदार ने हमें कहानियों की एक पुरानी किताब दिखाई, जिसके पन्ने पीले पड़ चुके थे, "
               "पर उसकी कहानियाँ आज भी ताज़ा लगती थीं।"),
    ("para_2", "The engineers spent the morning tracing a subtle timing bug. "
               "It appeared only when two requests arrived within the same "
               "millisecond, so they built a tiny harness to replay that "
               "exact collision until the fix held."),
    ("para_3", "बारिश की पहली बूँदें गिरते ही मिट्टी की सोंधी ख़ुशबू चारों ओर फैल गई। "
               "बच्चे छतों से नीचे उतर आए और काग़ज़ की नावें बनाकर पानी में छोड़ने लगे। "
               "पूरा मोहल्ला जैसे जीवंत हो उठा।"),
    # tier 6: long paragraph
    ("long_1", "विज्ञान की प्रगति ने हमारे जीवन को कई तरीक़ों से बदल दिया है। संचार अब पल भर का "
               "काम है, और दुनिया के किसी भी कोने की ख़बर तुरंत मिल जाती है। लेकिन इस गति के साथ "
               "धैर्य कम होता जा रहा है, और हमें यह याद रखना होगा कि कुछ चीज़ें समय लेकर ही "
               "सुंदर बनती हैं, जैसे रिश्ते, कला और समझ।"),
    ("long_2", "On the first morning of the expedition, the valley was still "
               "wrapped in mist. We checked the ropes twice, divided the "
               "supplies, and started along the ridge while the light was "
               "soft. By noon the trail narrowed to a ledge above the "
               "glacier, and every step demanded attention, but the view of "
               "the peaks made the effort feel weightless."),
    # tier 7: very long
    ("vlong_1", "शिक्षा का असली उद्देश्य केवल परीक्षाओं में अच्छे अंक लाना नहीं है, बल्कि सोचने की "
                "क्षमता विकसित करना है। जब विद्यार्थी प्रश्न पूछना सीखते हैं, तो वे केवल उत्तर "
                "याद करने वालों से कहीं आगे निकल जाते हैं। अच्छा शिक्षक वही है जो जिज्ञासा जगाए, "
                "ग़लतियों को सीखने का अवसर बनाए, और हर बच्चे की अलग गति का सम्मान करे। ऐसे "
                "वातावरण में सीखना बोझ नहीं, आनंद बन जाता है, और विद्यालय जीवन भर की यात्रा की "
                "पहली सीढ़ी।"),
    ("vlong_2", "The harbor town kept two clocks: one on the church tower "
                "that everyone trusted, and one at the fish market that ran "
                "eleven minutes fast. Nobody remembered who had set it "
                "wrong, but over the years the error became tradition. "
                "Boats left 'by market time' to catch the tide, weddings "
                "began 'by church time' so the bells would agree, and "
                "visitors who asked which clock was correct were told, with "
                "complete sincerity, that both were — each for its own "
                "purpose."),
    # tier 8: maximum (≈460 chars)
    ("max_1", "नदी के किनारे बसा वह गाँव हर साल बाढ़ का सामना करता था, फिर भी लोगों ने कभी "
              "किनारा नहीं छोड़ा। उनका कहना था कि नदी जितना लेती है, उससे कहीं ज़्यादा देती है — "
              "उपजाऊ मिट्टी, मछलियाँ, और ठंडी हवा। हर घर की दीवार पर पिछली बाढ़ों के निशान "
              "तारीख़ों के साथ दर्ज थे, जैसे कोई पुरानी बही हो। बुज़ुर्ग बच्चों को वे निशान दिखाकर "
              "तैरना, धैर्य रखना और एक-दूसरे की मदद करना सिखाते थे। इस तरह नदी केवल पानी नहीं, "
              "पूरी जीवन-शैली बन गई थी, और गाँव उसका आभारी था।"),
    ("max_2", "When the observatory finally reopened after years of repairs, "
              "the first visitors climbed the spiral stairs in silence, as "
              "if entering a library of the sky. The old refractor had been "
              "cleaned lens by lens, the dome turned on fresh bearings, and "
              "the brass controls polished until they remembered their "
              "shine. At dusk the shutters parted, the telescope swung "
              "toward Saturn, and a child who had waited all afternoon "
              "looked once, stepped back, and simply said that the rings "
              "were real — which, everyone agreed, was the entire point of "
              "rebuilding the place."),
    # extra warm-cadence prompts
    ("extra_1", "कृपया अगले चौराहे से बाएँ मुड़ें और सौ मीटर बाद दाईं ओर रुकें।"),
    ("extra_2", "Thank you for calling; your order has shipped and should "
                "arrive within three business days."),
]


def tiers() -> Dict[str, List[Tuple[str, str]]]:
    out: Dict[str, List[Tuple[str, str]]] = {}
    for pid, text in SWEEP_PROMPTS:
        tier = pid.rsplit("_", 1)[0]
        out.setdefault(tier, []).append((pid, text))
    return out


PERF_PROMPTS = {
    "short": SWEEP_PROMPTS[2][1],
    "medium": SWEEP_PROMPTS[8][1],
    "long": SWEEP_PROMPTS[14][1],
    "very_long": SWEEP_PROMPTS[18][1],
}
