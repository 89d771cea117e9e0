"""Frontend tests: normalizer cases (reference behavior: front.py:431-536
__main__ cases), tokenizer round-trips, and sentence-split invariants."""

import os

import numpy as np
import pytest

from indextts_tpu.utils.common import de_tokenized_by_CJK_char, tokenize_by_CJK_char
from indextts_tpu.utils.front import TextNormalizer, TextTokenizer
from indextts_tpu.utils.spm import (
    SentencePieceProcessor,
    build_vocab_from_pieces,
    parse_model_proto,
    serialize_model_proto,
)


@pytest.fixture(scope="module")
def normalizer():
    n = TextNormalizer()
    n.load()
    return n


class TestNormalizer:
    def test_zh_routing(self, normalizer):
        assert normalizer.use_chinese("我爱你！")
        assert normalizer.use_chinese("晕XUAN4是一种GAN3觉")  # pinyin forces zh
        assert not normalizer.use_chinese("I love you!")
        assert normalizer.use_chinese("123")  # no alpha -> zh

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("2.5平方电线", "二点五平方电线"),
            ("共465篇，约315万字", "共四百六十五篇,约三百一十五万字"),
            ("2002年的第一场雪，下在了2003年", "二零零二年的第一场雪,下在了二零零三年"),
            ("速度是10km/h", "速度是每小时十千米"),
            ("1键3连", "一键三连"),
            ("这是1024元的手机，你要吗？", "这是一千零二十四元的手机,你要吗?"),
            ("他这条视频点赞3000+，评论1000+，收藏500+", "他这条视频点赞三千多,评论一千多,收藏五百多"),
            ("电话：135-4567-8900", "电话,幺三五四五六七八九零零"),
        ],
    )
    def test_zh_cases(self, normalizer, text, expected):
        assert normalizer.normalize(text) == expected

    def test_zh_datetime(self, normalizer):
        out = normalizer.normalize("现在是北京时间2025年01月11日 20:00")
        assert "二零二五年一月十一日" in out
        assert "二十点" in out

    def test_pinyin_tone_protection(self, normalizer):
        out = normalizer.normalize("晕XUAN4是一种GAN3觉")
        # jqx rule: xu -> xv (reference: front.py:144-155); tones preserved
        assert "XVAN4" in out and "GAN3" in out
        out2 = normalizer.normalize("受不liao3你了")
        assert "liao3" in out2

    def test_pinyin_not_matching_english(self, normalizer):
        import re

        for bad in ["beta1", "better1", "voice2", "bala2", "babala2", "hunger2"]:
            assert re.match(TextNormalizer.PINYIN_TONE_PATTERN, bad, re.IGNORECASE) is None, bad

    def test_name_protection(self, normalizer):
        out = normalizer.normalize("克里斯托弗·诺兰执导了2010年的电影")
        assert "克里斯托弗-诺兰" in out
        assert "二零一零年" in out

    def test_english_contractions(self, normalizer):
        assert normalizer.normalize("where's the money?") == "where is the money?"
        assert normalizer.normalize("who's there?") == "who is there?"
        out = normalizer.normalize("今天是个好日子 it's a good day")
        assert "it is a good day" in out

    def test_en_cases(self, normalizer):
        assert normalizer.normalize("Couting down 3, 2, 1, go!") == "Couting down three, two, one, go!"
        out = normalizer.normalize("This sales for 2.5% off, only $12.5.")
        assert "two point five percent" in out
        assert "twelve point five dollars" in out
        assert "o'clock" in normalizer.normalize("See you at 8:00 AM")

    def test_punct_rep_map(self, normalizer):
        out = normalizer.normalize("“我爱你”的英语是“I love you”")
        assert "“" not in out and "”" not in out


class TestNormalizerReferenceCorpus:
    """The full test corpus from the reference's frontend self-test
    (front.py:436-481), transcribed with expected verbalizations (the
    reference delegates to WeTextProcessing FSTs; expectations follow the
    conventional Mandarin/English readings those FSTs produce)."""

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            ("IndexTTS 正式发布1.0版本了，效果666", ["一点零", "六百六十六"]),
            ("晕XUAN4是一种GAN3觉", ["XVAN4", "GAN3"]),
            ("我爱你！", ["我爱你!"]),
            ("“我爱你”的英语是“I love you”", ["'我爱你'", "I love you"]),
            ("2.5平方电线", ["二点五平方电线"]),
            ("共465篇，约315万字", ["四百六十五", "三百一十五万"]),
            ("2002年的第一场雪，下在了2003年", ["二零零二年", "二零零三年"]),
            ("速度是10km/h", ["每小时十千米"]),
            ("现在是北京时间2025年01月11日 20:00", ["二零二五年一月十一日", "二十点"]),
            ("他这条裤子是2012年买的，花了200块钱", ["二零一二年", "二百块钱"]),
            ("电话：135-4567-8900", ["幺三五四五六七八九零零"]),
            ("1键3连", ["一键三连"]),
            ("他这条视频点赞3000+，评论1000+，收藏500+", ["三千多", "一千多", "五百多"]),
            ("这是1024元的手机，你要吗？", ["一千零二十四元"]),
            ("受不liao3你了", ["liao3"]),
            ("“衣裳”不读衣chang2，而是读衣shang5", ["chang2", "shang5"]),
            ("最zhong4要的是：不要chong2蹈覆辙", ["zhong4", "chong2"]),
            ("不zuo1死就不会死", ["zuo1"]),
            ("8:00 AM 开会", ["八点"]),
            ("数到3就开始：1、2、3", ["数到三", "一,二,三"]),
            ("5G网络是4G网络的升级版，2G网络是3G网络的前身", ["五G", "四G", "二G", "三G"]),
            ("苹果于2030/1/2发布新 iPhone 2X 系列手机，最低售价仅 ¥12999",
             ["二零三零年一月二日", "二X", "一万两千九百九十九元"]),
            ("这酒...里...有毒...", ["…"]),
            ("只有,,,才是最好的", ["…"]),
            ("babala2是什么？", ["babala二"]),
            ("用beta1测试", ["beta一"]),
        ],
    )
    def test_zh_corpus(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            ("I love you!", ["I love you!"]),
            ("See you at 8:00 AM", ["eight o'clock"]),
            ("Couting down 3, 2, 1, go!", ["three, two, one"]),
            ("This sales for 2.5% off, only $12.5.", ["two point five percent", "twelve point five dollars"]),
            ("have you ever been to beta2?", ["beta two"]),
            ("such as XTTS, CosyVoice2, Fish-Speech, and F5-TTS",
             ["CosyVoice two", "F five-TTS"]),
            ("where's the money?", ["where is"]),
            ("who's there?", ["who is"]),
            ("which's the best?", ["which is"]),
            ("how's it going?", ["how is"]),
        ],
    )
    def test_en_corpus(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"

    def test_zh_no_digits_left(self, normalizer):
        """Every zh-routed corpus case must come out fully verbalized."""
        import re

        cases = [
            "IndexTTS 正式发布1.0版本了，效果666", "2.5平方电线", "共465篇，约315万字",
            "2002年的第一场雪，下在了2003年", "速度是10km/h", "现在是北京时间2025年01月11日 20:00",
            "他这条裤子是2012年买的，花了200块钱", "电话：135-4567-8900", "1键3连",
            "他这条视频点赞3000+，评论1000+，收藏500+", "这是1024元的手机，你要吗？",
            "数到3就开始：1、2、3", "苹果于2030/1/2发布新 iPhone 2X 系列手机，最低售价仅 ¥12999",
        ]
        for text in cases:
            out = normalizer.normalize(text)
            assert re.search(r"\d", out) is None, f"{text!r} -> {out!r} has digits left"

    def test_name_protection_corpus(self, normalizer):
        out = normalizer.normalize("约瑟夫·高登-莱维特（Joseph Gordon-Levitt is an American actor）")
        assert "约瑟夫-高登-莱维特" in out
        out2 = normalizer.normalize(
            "蒂莫西·唐纳德·库克（英文名：Timothy Donald Cook），通称蒂姆·库克（Tim Cook）"
        )
        assert "蒂莫西-唐纳德-库克" in out2 and "蒂姆-库克" in out2


class TestNormalizerWextCategories:
    """WeTextProcessing FST categories the reference inherits beyond the
    corpus (VERDICT round-1 gap #3): fractions, ranges, 第N ordinals,
    negatives, temperatures, long-ID digit reading, 二/两 selection, and
    English ordinals/cents."""

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            ("全书共1/3的篇幅", ["三分之一"]),
            ("比分是3/4", ["四分之三"]),
            ("预计3-5天到货", ["三到五天"]),
            ("气温2~8度", ["二到八度"]),
            ("他得了第1名，我得了第22名", ["第一名", "第二十二名"]),
            ("海拔-155米", ["负一百五十五米"]),
            ("气温-5°C", ["零下五摄氏度"]),
            ("体温37.5℃", ["三十七点五摄氏度"]),
            ("华氏98.6°F", ["九十八点六华氏度"]),
            ("卡号6222021234567890123", ["六二二二零二幺二三四五六七八九零幺二三"]),
            ("重3.2g", ["三点二克"]),
            ("全长2000米，耗资2万元，历时2年", ["两千米", "两万元", "二年"]),
            ("22000人参加", ["两万两千人"]),
            ("第2000名", ["第二千名"]),
            # partial (year-less) dates
            ("活动3月15号开始", ["三月十五号"]),
            ("他2月3日出生", ["二月三日"]),
            # weekday digit forms
            ("周3开会", ["周三"]),
            ("星期7休息", ["星期日"]),
            ("礼拜6逛街", ["礼拜六"]),
            # currency ranges (single-money rule must not eat the left end)
            ("价格¥3000-5000之间", ["三千到五千元"]),
            ("门票$10-20", ["十到二十美元"]),
            # measure-word 两 selection (12个 must stay 十二个)
            ("买2个苹果和12个梨", ["两个", "十二个"]),
            ("2只猫2条狗住在2层", ["两只", "两条", "两层"]),
            # mixed 万/亿 with decimals
            ("市值3.5万亿元", ["三点五万亿元"]),
            ("涨了1.2亿", ["一点二亿"]),
            # round-3 breadth: scores, time/date/temperature ranges, dotted
            # versions & IPs, math operators, thousands separators, unit
            # glyphs, signed percents, letter-attached IDs
            ("比分3:2领先", ["三比二"]),
            ("营业时间8:00-22:00", ["八点到二十二点"]),
            ("iOS更新到16.4.1版本", ["十六点四点一"]),
            ("IP地址是192.168.1.1", ["一九二点一六八点一点一"]),
            ("温度在-5~3℃之间", ["零下五到三摄氏度"]),
            ("会议于2024年3月5日-7日举行", ["三月五日到七日"]),
            ("3月-5月是旺季", ["三月到五月"]),
            ("5×3等于15", ["五乘三"]),
            ("1+1=2", ["一加一等于二"]),
            ("10÷2等于5", ["十除以二"]),
            ("误差±3毫米", ["正负三毫米"]),
            ("The game ended 120:119", ["one hundred twenty to one hundred nineteen"]),
            ("大约100,000人参加", ["十万人"]),
            ("共1,234,567元", ["一百二十三万四千五百六十七元"]),
            # 4-digit left group is an enumeration, NOT thousands grouping
            ("年份2023,456人到场", ["两千零二十三,四百五十六人"]),
            # 3+-digit scores must not have an inner clock time consumed
            ("比分是120:119", ["一百二十比一百一十九"]),
            # percent range with a signed left endpoint
            ("增长-2%~3%", ["负百分之二到百分之三"]),
            ("面积约120㎡", ["一百二十平方米"]),
            ("占地3km²", ["三平方千米"]),
            ("股价下跌了-2.3%", ["负百分之二点三"]),
            ("车牌号是京A12345", ["京A一二三四五"]),
            # trailing-plus must survive the addition-operator pass
            ("点赞3000+的视频", ["三千多"]),
            ("增长了50%-60%", ["百分之五十到百分之六十"]),
            ("温度20°C-25°C之间", ["二十摄氏度到二十五摄氏度"]),
            ("用时1:02:33", ["一点零二分三十三秒"]),
        ],
    )
    def test_zh_categories(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            ("It costs $12.50 exactly", ["twelve dollars and fifty cents"]),
            ("just $0.99", ["ninety nine cents"]),
            ("read pages 3-5 tonight", ["three to five"]),
            ("it was -5 outside", ["minus five"]),
            ("water boils at 100°C", ["one hundred degrees Celsius"]),
            ("the 21st of May", ["twenty first"]),
            ("the 3rd time", ["third"]),
            ("the 12th floor", ["twelfth"]),
            ("the 40th anniversary", ["fortieth"]),
            # round-3 breadth
            ("version 16.4.1 is out", ["sixteen point four point one"]),
            ("about 100,000 users", ["one hundred thousand"]),
            ("open 8:00-22:00 daily", ["to twenty two o'clock"]),
            ("5×3=15 is basic math", ["five times three equals fifteen"]),
        ],
    )
    def test_en_categories(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"


class TestNormalizerAdversarialCorpus:
    """Round-4 adversarial ITN corpus (verdict #6): nested/ambiguous ranges,
    decimals inside units, ID/phone format variants, mixed-script sentences,
    year-vs-number ambiguity, signed quantities in context — curated beyond
    the reference's own self-test corpus. Behavioral surface being matched:
    the WeTextProcessing pynini grammars the reference delegates to
    (ref front.py:100-111). Intentional deltas are documented at the end."""

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            # nested / ambiguous ranges
            ("上涨了3%-5%之间", ["百分之三到百分之五"]),
            ("跌幅在-3%到-5%之间", ["负百分之三到负百分之五"]),
            ("收益率从-1.5%升至2.8%", ["负百分之一点五", "百分之二点八"]),
            ("每天工作8-10小时,休息2-3次", ["八到十小时", "二到三次"]),
            ("价格在¥99-¥199之间", ["九十九到一百九十九元"]),
            ("温度从-10℃升到-2℃", ["零下十摄氏度", "零下二摄氏度"]),
            ("增长2倍-3倍", ["二倍到三倍"]),
            ("3~5万元的预算", ["三到五万元"]),
            ("2021年-2023年的数据", ["二零二一年到二零二三年"]),
            # the measure-word 两 rule composes with the range rewrite
            ("服药2次-3次", ["两次到三次"]),
            # decimals inside units
            ("速度是1.5km/h", ["每小时一点五千米"]),
            ("重量0.5kg以上", ["零点五千克"]),
            ("每小时3.6km", ["三点六千米"]),
            ("镜头35mm焦距", ["三十五毫米"]),
            ("降雨量12.5mm", ["十二点五毫米"]),
            ("屏幕6.1英寸", ["六点一英寸"]),
            # ID / phone format variants
            ("电话010-12345678转801", ["零幺零幺二三四五六七八"]),
            ("手机号+86 138 0013 8000", ["加八六幺三八零零幺三八零零零"]),
            ("热线400-800-8888", ["四零零八零零八八八八"]),
            ("身份证号110101199003077513",
             ["幺幺零幺零幺幺九九零零三零七七五幺三"]),
            ("邮编100080", ["幺零零零八零"]),
            ("代码是0755", ["零七五五"]),
            ("订单号SF1234567890123", ["SF幺二三四五六七八九零幺二三"]),
            ("工号A0042号员工", ["A零零四二号"]),
            # mixed-script sentences
            ("他用iPhone 15 Pro拍了4K视频", ["十五", "四K"]),
            ("这款CPU有8核16线程,主频3.5GHz", ["八核十六线程", "三点五GHz"]),
            ("第5代iPad Air售价$599", ["第五代", "五百九十九美元"]),
            ("维生素B12每天2.4微克", ["B十二", "二点四微克"]),
            ("USB 3.0接口传输500MB/s", ["三点零", "五百MB"]),
            # year-vs-number ambiguity (年份 digit-read vs 计数 cardinal)
            ("1998年发生了很多事", ["一九九八年"]),
            ("他跑了1998米", ["一千九百九十八米"]),
            ("公元前221年统一六国", ["二二一年"]),
            ("这本书有2024页", ["两千零二十四页"]),
            ("今年是2024年,距离1949年已有75年",
             ["二零二四年", "一九四九年", "七十五年"]),
            ("1200年历史的古寺", ["一二零零年"]),
            ("90年代的歌曲", ["九十年代"]),
            ("存了5年定期", ["五年"]),
            ("2008年奥运会有10500名运动员", ["二零零八年", "一万零五百名"]),
            # signed quantities in context
            ("净利润-1200万元", ["负一千二百万元"]),
            ("误差范围±0.05毫米", ["正负零点零五毫米"]),
            ("得分+15和-7", ["正十五", "负七"]),
            ("账户余额-500元", ["负五百元"]),
            ("增速由+5%转为-2%", ["正百分之五", "负百分之二"]),
            ("坐标'-3,4'处", ["负三,四"]),
        ],
    )
    def test_zh_adversarial(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            ("It rose from -2.5% to 3.7% overnight",
             ["minus two point five percent", "three point seven percent"]),
            ("Call 1-800-555-0199 now",
             ["one eight zero zero five five five zero one nine nine"]),
            ("The meeting is 9:30-11:45 AM",
             ["nine thirty to eleven forty five"]),
            ("He ran 26.2 miles in 3:59:58",
             ["twenty six point two miles",
              "three fifty nine and fifty eight seconds"]),
            ("Prices range $1,299-$1,499",
             ["one thousand two hundred ninety nine dollars to "
              "one thousand four hundred ninety nine dollars"]),
            ("The 2nd-3rd floors are closed", ["second to third"]),
            ("Temperatures hit -40° yesterday", ["minus forty degrees"]),
            ("A 7.5% APR on $10,000",
             ["seven point five percent", "ten thousand dollars"]),
        ],
    )
    def test_en_adversarial(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"


class TestEnAdversarialCorpusR5:
    """Round-5 English ITN adversarial corpus (VERDICT r4 #5): dates incl.
    ordinals/decades, currencies with sub-units and scale words, phone/ID
    formats, measures, fractions, abbreviations, ranges, and mixed en-zh
    routing — mirroring round 4's zh corpus. Behavioral surface matched:
    WeTextProcessing's tn.english FST pipeline (ref front.py:100-111)."""

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            # dates: month-name, slash, ISO-equivalent, ordinals, decades
            ("Independence Day is July 4, 1776",
             ["July fourth", "seventeen seventy six"]),
            ("She was born on March 3", ["March third"]),
            ("The deadline is 4/15/2023",
             ["april fifteenth", "twenty twenty three"]),
            ("Released on 12/25/1999",
             ["december twenty fifth", "nineteen ninety nine"]),
            ("on the 22nd of June, 1941",
             ["twenty second", "nineteen forty one"]),
            ("January 1st, 2000 celebrations", ["January first two thousand"]),
            ("the meeting is on May 31", ["May thirty first"]),
            ("The 1990s were wild", ["nineteen nineties"]),
            ("Born in the '80s", ["eighties"]),
            ("music of the 2000s", ["two thousands"]),
            ("The 1939-1945 war",
             ["nineteen thirty nine to nineteen forty five"]),
            # currencies: scale words, suffix scales, sub-units, €/£
            ("It cost $5 million to build", ["five million dollars"]),
            ("a $1.5B valuation", ["one point five billion dollars"]),
            ("raised $250K last year", ["two hundred fifty thousand dollars"]),
            ("a $7 billion deal", ["seven billion dollars"]),
            ("€19.99 for the basic plan",
             ["nineteen euros and ninety nine cents"]),
            ("it costs just €1 today", ["one euro"]),
            ("£3.50 for a pint", ["three pounds and fifty pence"]),
            ("a £20 note", ["twenty pounds"]),
            ("only £0.01 left", ["one penny"]),
            ("$0.50 each", ["fifty cents"]),
            # phone / ID formats
            ("Call +1 (212) 555-0123 today",
             ["plus one two one two five five five zero one two three"]),
            ("Dial (800) 555-0199 for support",
             ["eight zero zero five five five zero one nine nine"]),
            ("SSN 123-45-6789 is fake",
             ["one two three four five six seven eight nine"]),
            ("agent 007 reporting", ["zero zero seven"]),
            ("error code 0042", ["zero zero four two"]),
            # measures
            ("The car hit 120km/h on the highway",
             ["one hundred twenty kilometers per hour"]),
            ("a 5kg dumbbell", ["five kilograms"]),
            ("just 1km to go", ["one kilometer"]),
            ("a 16GB stick of RAM", ["sixteen gigabytes"]),
            ("transfers at 500MB/s", ["five hundred megabytes per second"]),
            ("a 3.5GHz processor", ["three point five gigahertz"]),
            ("the speed limit is 65mph", ["sixty five miles per hour"]),
            ("add 250ml of water", ["two hundred fifty milliliters"]),
            ("latency under 20ms", ["twenty milliseconds"]),
            ("weighs 180lbs", ["one hundred eighty pounds"]),
            ("an 8oz steak", ["eight ounces"]),
            ("0.5mg of melatonin", ["zero point five milligrams"]),
            # fractions
            ("add 1/2 cup of sugar", ["one half"]),
            ("3/4 of voters agree", ["three quarters"]),
            ("a 2/3 majority is required", ["two thirds"]),
            ("a 1/4 turn", ["one quarter"]),
            ("a 5/8 inch wrench", ["five eighths"]),
            ("open 24/7 every day", ["twenty four seven"]),
            # abbreviations (whitelist)
            ("Dr. Smith will see you", ["Doctor Smith"]),
            ("Mr. Jones and Mrs. Jones", ["Mister Jones", "Misses Jones"]),
            ("apples, oranges, etc.", ["et cetera"]),
            ("Alien vs. Predator", ["versus"]),
            ("No. 5 on the list", ["number five"]),
            # ranges
            ("scores of 98-100", ["ninety eight to one hundred"]),
            ("a 3-5 day delivery window", ["three to five day"]),
            # electronic (tn.english electronic FST): emails and URLs
            ("email me at john.doe@example.com today",
             ["john dot doe at example dot com"]),
            ("support+tts@example.co.uk replies fast",
             ["support plus tts at example dot co dot uk"]),
            ("visit www.example.com for details",
             ["W W W dot example dot com"]),
            ("see https://docs.example.org/guide now",
             ["H T T P S colon slash slash docs dot example dot org slash guide"]),
            ("the example.com homepage", ["example dot com"]),
            # a.m./p.m. dotted forms must not split sentences or leak dots
            ("the train leaves at 8:30 a.m. and returns at 9 p.m.",
             ["eight thirty AM", "nine PM"]),
            # street/title abbreviations
            ("Prof. Miller teaches at noon", ["Professor Miller"]),
            ("St. Paul was here", ["Saint Paul"]),
            ("221B Baker St. is famous", ["Baker Street"]),
            ("5th Ave. is crowded", ["fifth Avenue"]),
            ("Martin Luther King Jr. spoke", ["Junior"]),
            # feet-and-inches, #N, dimensions, multipliers, trailing plus
            ("he is 6'2\" tall", ["six foot two"]),
            ("the #1 hit of the summer", ["number one"]),
            ("a 4x4 truck", ["four by four"]),
            ("3x faster than before", ["three times faster"]),
            ("rated 18+ only", ["eighteen plus"]),
            # mixed en-zh sentences (router picks the zh path on any CJK,
            # and the zh rules still verbalize the embedded western forms)
            ("GDP增长了3%", ["百分之三"]),
            ("这款laptop只要$999", ["九百九十九美元"]),
            ("iPhone 15售价$799起", ["十五", "七百九十九美元"]),
        ],
    )
    def test_en_adversarial_r5(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"

    def test_en_no_digits_left_r5(self, normalizer):
        """Every en-routed r5 case must come out fully verbalized."""
        import re as _re

        cases = [
            "Independence Day is July 4, 1776", "The deadline is 4/15/2023",
            "The 1990s were wild", "It cost $5 million to build",
            "€19.99 for the basic plan", "£3.50 for a pint",
            "Call +1 (212) 555-0123 today", "The car hit 120km/h on the highway",
            "add 1/2 cup of sugar", "open 24/7 every day",
            "No. 5 on the list", "scores of 98-100",
        ]
        for text in cases:
            out = normalizer.normalize(text)
            assert _re.search(r"\d", out) is None, f"{text!r} -> {out!r} has digits left"

    @pytest.mark.parametrize(
        "text,must_contain",
        [
            # intentional deltas, pinned so drift is deliberate:
            # context-free counting nouns keep cardinal readings (the
            # WeText grammars have no discourse model either)
            ("房间号1203", ["一千二百零三"]),
            # letter-dash-model names keep the dash (punct map is
            # deliberately conservative around product names)
            ("GPT-4有1.8万亿参数", ["一点八万亿"]),
            # caret exponents are out of scope for both implementations
            ("电荷-1.6×10^-19库仑", ["负一点六乘十", "负十九"]),
        ],
    )
    def test_documented_deltas(self, normalizer, text, must_contain):
        out = normalizer.normalize(text)
        for frag in must_contain:
            assert frag in out, f"{text!r} -> {out!r} missing {frag!r}"


class TestCJK:
    def test_round_trip(self):
        s = tokenize_by_CJK_char("你好世界是 hello world 的中文")
        assert s == "你 好 世 界 是 HELLO WORLD 的 中 文"
        assert de_tokenized_by_CJK_char(s, do_lower_case=True) == "你好世界是hello world的中文"

    def test_multiple_runs_one_chunk_no_marker_leak(self):
        """Two Latin runs joined by an apostrophe share one whitespace chunk;
        EVERY marker must be restored (the reference's common.py restores
        only the first, leaking literal <sent_1> — fixed deliberately)."""
        assert de_tokenized_by_CJK_char("DON'T") == "DON'T"
        assert de_tokenized_by_CJK_char("你 好 DON'T 世 界") == "你好DON'T世界"
        assert "<sent_" not in de_tokenized_by_CJK_char("A'B'C D E")

    def test_run_text_colliding_with_marker(self):
        """A Latin run whose TEXT collides with the stash markers ('sent'
        is a substring of '<sent_N>') or is a substring of another run must
        not corrupt the restoration map — stashing is positional, not
        string-replace based."""
        assert de_tokenized_by_CJK_char("HELLO 你 sent 好") == "HELLO你sent好"
        assert de_tokenized_by_CJK_char("sent 你 sent") == "sent你sent"
        # short run that is a substring of a LATER longer run
        assert de_tokenized_by_CJK_char("LO 你 HELLO") == "LO你HELLO"
        assert "<sent_" not in de_tokenized_by_CJK_char("sent absent consent")


class TestNormalizerReviewRegressions:
    """Cases from the round-3 normalizer review, each verified by execution
    against the pre-fix behavior quoted in the finding."""

    def test_year_month_count_not_a_date(self, normalizer):
        """年N月 followed by a plain count must not eat the count's first
        digits as a bogus 日 (was: '2025年3月1000米' -> '…三月十日零米')."""
        assert normalizer.normalize("2025年3月1000米比赛开始") == \
            "二零二五年三月一千米比赛开始"
        assert normalizer.normalize("2025年1月15000名学生") == \
            "二零二五年一月一万五千名学生"
        # marker-less real days still read as dates
        assert normalizer.normalize("2025年1月2") == "二零二五年一月二日"

    def test_money_with_scale_suffix(self, normalizer):
        """¥N万: the unit goes AFTER the scale (was: '¥2万' -> 二元万)."""
        assert normalizer.normalize("价格是¥2万") == "价格是两万元"
        assert normalizer.normalize("市值¥3000万") == "市值三千万元"
        assert normalizer.normalize("$1.5亿") == "一点五亿美元"
        assert normalizer.normalize("预算¥3-5万") == "预算三到五万元"

    def test_zero_minutes_with_seconds(self, normalizer):
        """08:00:30 keeps 零分 (was: '八点三十秒', adjacent to 8:30)."""
        out = normalizer.normalize("时间是08:00:30")
        assert "八点零分三十秒" in out

    def test_en_iso_date_not_a_range(self, normalizer):
        """YYYY-MM-DD reads as a date (was: 'twenty twenty three to three
        to twenty seven')."""
        out = normalizer.normalize("released on 2023-03-27 worldwide")
        assert "march third" in out or "march twenty" in out  # day ordinal
        assert " to three to " not in out

    def test_skipped_middle_group_reads_ling(self):
        """A whole zero 万-group between emitted groups needs 零: 100005000
        read 一亿五千 pre-fix (wrong amount out loud)."""
        from indextts_tpu.utils.zh_num import zh_integer

        assert zh_integer("100005000") == "一亿零五千"
        assert zh_integer("100000001") == "一亿零一"
        assert zh_integer("100010000") == "一亿零一万"
        # no spurious 零 when groups are adjacent and full-width
        assert zh_integer("12345678") == "一千二百三十四万五千六百七十八"
        assert zh_integer("100001") == "十万零一"

    def test_en_trillion_scale(self):
        from indextts_tpu.utils.zh_num import en_integer

        assert en_integer(2 * 10**12) == "two trillion"
        assert en_integer(1_200_000_000_000) == "one trillion two hundred billion"

    def test_huge_number_no_crash(self, normalizer):
        # >= 10^16 exceeds the 万/亿/万亿 group table: digit-by-digit, not
        # IndexError out of the whole request
        out = normalizer.normalize("第10000000000000000名")
        assert out.startswith("第一零") and out.endswith("名")

    def test_year_month_range_not_a_date(self, normalizer):
        # was: '二零二五年一月三日月很忙' (bogus full date + dangling 月)
        assert normalizer.normalize("2025年1-3月很忙") == "二零二五年一到三月很忙"

    def test_dash_dates_still_verbalize(self, normalizer):
        assert normalizer.normalize("2025-01-11") == "二零二五年一月十一日"
        assert normalizer.normalize("2025/1/2") == "二零二五年一月二日"

    def test_ordinal_range(self, normalizer):
        # was: '他得了第三负五名' (left endpoint stripped, dash read as minus)
        assert normalizer.normalize("他得了第3-5名") == "他得了第三到五名"

    def test_en_year_range(self, normalizer):
        assert normalizer.normalize("from 1990-1995 it grew") == \
            "from nineteen ninety to nineteen ninety five it grew"

    def test_en_percent_and_money_ranges(self, normalizer):
        assert normalizer.normalize("it rose 50%-60% then") == \
            "it rose fifty percent to sixty percent then"
        assert normalizer.normalize("cost $300-$500 each") == \
            "cost three hundred dollars to five hundred dollars each"

    def test_en_spaced_and_comma_money(self, normalizer):
        """Money must win over the year rule even with a space after '$'
        (the money regexes accept \\$\\s*; a one-char lookbehind on the year
        rule cannot guard that), and comma-grouped amounts parse."""
        assert normalizer.normalize("$ 1999 total") == \
            "one thousand nine hundred ninety nine dollars total"
        assert normalizer.normalize("$1,990 total") == \
            "one thousand nine hundred ninety dollars total"
        assert normalizer.normalize("$12.50 each") == "twelve dollars and fifty cents each"
        assert normalizer.normalize("$1 only") == "one dollar only"

    def test_en_comma_grouped_cardinal_not_a_year(self, normalizer):
        # was: 'nineteen ninety dollars' (comma strip fed the year rule)
        assert normalizer.normalize("he earned 1,990 dollars") == \
            "he earned one thousand nine hundred ninety dollars"
        # plain 4-digit years still read as years
        assert normalizer.normalize("in 1990 it began") == "in nineteen ninety it began"
        # unit guards: $ and % endpoints keep their own rules
        assert normalizer.normalize("$1990 total") == \
            "one thousand nine hundred ninety dollars total"
        assert normalizer.normalize("it hit 1990% uptime") == \
            "it hit one thousand nine hundred ninety percent uptime"

    def test_verbalizer_exception_degrades_not_aborts(self, normalizer, monkeypatch):
        """Reference parity (ref front.py:128-146): a rule bug degrades the
        output instead of raising out of the request — but to raw text, not
        the reference's empty string."""
        monkeypatch.setattr(normalizer, "_normalize_zh",
                            lambda t: (_ for _ in ()).throw(RuntimeError("boom")))
        out = normalizer.normalize("你好123")
        assert "你好" in out
        monkeypatch.setattr(normalizer, "_normalize_en",
                            lambda t: (_ for _ in ()).throw(RuntimeError("boom")))
        out = normalizer.normalize("hello 123 world")
        assert "hello" in out and "world" in out


def _demo_sp():
    vocab = build_vocab_from_pieces(
        [
            ("▁H", -1.0), ("▁HE", -1.5), ("LL", -2.0), ("LLO", -2.5), ("▁HELLO", -3.0),
            ("▁W", -1.2), ("OR", -1.8), ("ORL", -2.2), ("ORLD", -2.8), ("▁WORLD", -3.2),
            ("H", -10.0), ("E", -10.0), ("L", -10.0), ("O", -10.0), ("W", -10.0),
            ("R", -10.0), ("D", -10.0), ("▁", -9.0),
            (".", -8.0), ("▁.", -8.0), ("!", -8.0), ("?", -8.0), (",", -8.0), ("-", -8.0),
            ("你", -7.0), ("好", -7.0), ("▁你", -7.0), ("▁好", -7.0),
        ],
        model_type=2,
    )
    return SentencePieceProcessor(vocab=vocab)


class TestSPM:
    def test_bpe_merge_order(self):
        sp = _demo_sp()
        assert sp.EncodeAsPieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]

    def test_proto_round_trip(self):
        sp = _demo_sp()
        blob = serialize_model_proto(sp.v)
        sp2 = SentencePieceProcessor(vocab=parse_model_proto(blob))
        assert sp2.v.pieces == sp.v.pieces
        assert np.allclose(sp2.v.scores, sp.v.scores)
        assert sp2.EncodeAsPieces("HELLO WORLD") == ["▁HELLO", "▁WORLD"]

    def test_decode(self):
        sp = _demo_sp()
        ids = sp.EncodeAsIds("HELLO WORLD")
        assert sp.Decode(ids) == "HELLO WORLD"

    def test_unk(self):
        sp = _demo_sp()
        ids = sp.EncodeAsIds("HELLO Z")
        assert sp.unk_id() in ids

    def test_unigram_viterbi(self):
        vocab = build_vocab_from_pieces(
            [("▁AB", -1.0), ("C", -1.0), ("▁A", -1.0), ("BC", -1.5), ("A", -5.0), ("B", -5.0), ("▁", -5.0)],
            model_type=1,
        )
        sp = SentencePieceProcessor(vocab=vocab)
        # best path: ▁AB + C (-2.0) beats ▁A + BC (-2.5)
        assert sp.EncodeAsPieces("ABC") == ["▁AB", "C"]


class TestTokenizer:
    def test_tokenize_pipeline(self, normalizer):
        tok = TextTokenizer(sp_model=_demo_sp(), normalizer=normalizer)
        pieces = tok.tokenize("hello world!")
        assert pieces == ["▁HELLO", "▁WORLD", "!"]
        ids = tok.convert_tokens_to_ids(pieces)
        assert tok.convert_ids_to_tokens(ids) == pieces
        assert tok.decode(ids, do_lower_case=True) == "hello world!"

    def test_special_ids(self, normalizer):
        tok = TextTokenizer(sp_model=_demo_sp(), normalizer=normalizer)
        assert tok.bos_token_id == 0
        assert tok.eos_token_id == 1
        assert tok.unk_token_id == 2

    def test_split_sentences_basic(self):
        tok_list = ["▁A", "b", "▁.", "▁C", "d", "!", "▁E", "?"]
        out = TextTokenizer.split_sentences_by_token(tok_list, [".", "!", "?", "▁.", "▁?", "▁..."], 120)
        # exact: short sentences merge back into one under a wide cap
        assert out == [["▁A", "b", "▁.", "▁C", "d", "!", "▁E", "?"]]
        # short sentences get merged back up to max
        out2 = TextTokenizer.split_sentences_by_token(tok_list, [".", "!", "?", "▁.", "▁?", "▁..."], 3)
        assert all(len(s) <= 3 for s in out2)
        assert [t for s in out2 for t in s] == tok_list  # nothing lost

    def test_split_long_with_comma_fallback(self):
        toks = ["w"] * 10 + [","] + ["x"] * 10
        out = TextTokenizer.split_sentences_by_token(toks, ["."], 15)
        assert all(len(s) <= 15 for s in out)
        assert [t for s in out for t in s] == toks

    def test_hard_chunking(self):
        toks = ["w"] * 50
        with pytest.warns(RuntimeWarning):
            out = TextTokenizer.split_sentences_by_token(toks, ["."], 16)
        assert all(len(s) <= 16 for s in out)
        assert sum(len(s) for s in out) == 50

    def test_no_split_before_quote(self):
        # a sentence mark followed by a quote should not split (front.py:367)
        toks = ["▁A", "b", ".", "'", "▁C", "."]
        out = TextTokenizer.split_sentences_by_token(toks, ["."], 120)
        assert out == [["▁A", "b", ".", "'", "▁C", "."]]


class TestLongCorpusSplit:
    """The reference frontend self-test's three long-document cases
    (front.py:478-481) driven through normalize + the sentence splitter with
    the reference's split-length assertion (front.py:521-529): every split
    sentence must fit max_tokens_per_sentence and no token may be lost."""

    LONG_CASES = [
        "《盗梦空间》是由美国华纳兄弟影片公司出品的电影，由克里斯托弗·诺兰执导并编剧，莱昂纳多·迪卡普里奥、玛丽昂·歌迪亚、约瑟夫·高登-莱维特、艾利奥特·佩吉、汤姆·哈迪等联袂主演，2010年7月16日在美国上映，2010年9月1日在中国内地上映，2020年8月28日在中国内地重映。影片剧情游走于梦境与现实之间，被定义为“发生在意识结构内的当代动作科幻片”，讲述了由莱昂纳多·迪卡普里奥扮演的造梦师，带领特工团队进入他人梦境，从他人的潜意识中盗取机密，并重塑他人梦境的故事。",
        "清晨拉开窗帘，阳光洒在窗台的Bloomixy花艺礼盒上——薰衣草香薰蜡烛唤醒嗅觉，永生花束折射出晨露般光泽。设计师将“自然绽放美学”融入每个细节：手工陶瓷花瓶可作首饰收纳，香薰精油含依兰依兰舒缓配方。限量款附赠《365天插花灵感手册》，让每个平凡日子都有花开仪式感。\n宴会厅灯光暗下的刹那，Glimmeria星月系列耳坠开始发光——瑞士冷珐琅工艺让蓝宝石如银河流动，钛合金骨架仅3.2g无负重感。设计师秘密：内置微型重力感应器，随步伐产生0.01mm振幅，打造“行走的星光”。七夕限定礼盒含星座定制铭牌，让爱意如星辰永恒闪耀。",
        "电影1：“黑暗骑士”（演员：克里斯蒂安·贝尔、希斯·莱杰；导演：克里斯托弗·诺兰）；电影2：“盗梦空间”（演员：莱昂纳多·迪卡普里奥；导演：克里斯托弗·诺兰）；电影3：“钢琴家”（演员：艾德里安·布洛迪；导演：罗曼·波兰斯基）；电影4：“泰坦尼克号”（演员：莱昂纳多·迪卡普里奥；导演：詹姆斯·卡梅隆）；电影5：“阿凡达”（演员：萨姆·沃辛顿；导演：詹姆斯·卡梅隆）；电影6：“南方公园：大电影”（演员：马特·斯通、托马斯·艾恩格瑞；导演：特雷·帕克）",
    ]

    SENT_MARKS = [".", "!", "?", "▁.", "▁?", "▁..."]

    @pytest.mark.parametrize("idx", [0, 1, 2])
    def test_normalize_verbalizes_fully(self, normalizer, idx):
        import re

        out = normalizer.normalize(self.LONG_CASES[idx])
        assert re.search(r"\d", out) is None, f"digits left: {out!r}"
        # name protection survives inside long documents
        if idx == 0:
            assert "克里斯托弗-诺兰" in out
            assert "约瑟夫-高登-莱维特" in out

    @pytest.mark.parametrize("max_tokens", [120, 60])
    @pytest.mark.parametrize("idx", [0, 1, 2])
    def test_split_lengths(self, normalizer, idx, max_tokens):
        out = normalizer.normalize(self.LONG_CASES[idx])
        toks = [t for t in tokenize_by_CJK_char(out).split(" ") if t]
        sents = TextTokenizer.split_sentences_by_token(toks, self.SENT_MARKS, max_tokens)
        assert len(sents) > 1
        assert all(len(s) <= max_tokens for s in sents), [len(s) for s in sents]
        assert [t for s in sents for t in s] == toks  # nothing lost


def test_pinyin_vocab_id_range():
    """Reference check (front.py:505-509): vocab ids 8474-10201 of the
    published bpe.model are all pinyin-tone tokens. Needs the real
    checkpoint vocab; skipped when absent from the image."""
    import re

    path = os.environ.get("INDEXTTS_BPE", "checkpoints/bpe.model")
    if not os.path.exists(path):
        pytest.skip("published bpe.model not present")
    from indextts_tpu.utils.spm import SentencePieceProcessor

    sp = SentencePieceProcessor(path)
    for i in range(8474, 10201):
        piece = sp.id_to_piece(i)
        assert re.match(TextNormalizer.PINYIN_TONE_PATTERN, piece, re.IGNORECASE), piece


class TestNormalizerFuzz:
    """Serving-facing robustness: normalize() must never raise and must
    always return a string, for arbitrary junk input (the web form accepts
    anything). Seeded, deterministic."""

    def test_random_unicode_never_raises(self, normalizer):
        rng = np.random.default_rng(0)
        pools = [
            (0x20, 0x7F),      # ascii
            (0x4E00, 0x9FFF),  # CJK
            (0x3000, 0x303F),  # CJK punct
            (0x1F300, 0x1F600),  # emoji
            (0x0391, 0x03C9),  # greek
        ]
        for i in range(200):
            n = int(rng.integers(0, 60))
            chars = []
            for _ in range(n):
                lo, hi = pools[int(rng.integers(0, len(pools)))]
                chars.append(chr(int(rng.integers(lo, hi))))
            s = "".join(chars)
            out = normalizer.normalize(s)
            assert isinstance(out, str)

    def test_adversarial_numeric_shapes(self, normalizer):
        cases = [
            "1" * 40, "1,2,3,4,5", "1.2.3.4.5.6", "::::", "%%%%", "---",
            "1:2:3:4", "999999999999999999999999", "0.0.0.0:8080", "3.1415926" * 5,
            "-", "+", "±", "~", "1~", "~1", "%", "5%%", "¥", "$", "$-", "-$5",
            "12:", ":12", "1,,2", ",1", "1,", "第", "第第3", "100,00,000",
        ]
        for s in cases:
            out = normalizer.normalize(s)
            assert isinstance(out, str)


def test_signed_percent_range_both_endpoints(normalizer):
    assert normalizer.normalize("跌幅-5%~-2%") == "跌幅负百分之五到负百分之二"
    assert "负百分之二到百分之三" in normalizer.normalize("增长-2%~3%")
