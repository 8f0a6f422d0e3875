package com.google.gson;

import java.math.BigDecimal;

/**
 * Clean-room equivalent of gson 2.3.1's string-backed number: the parser
 * stores the RAW literal and every numeric view is derived lazily.
 * {@code longValue()} tries {@code Long.parseLong} on the raw text and
 * falls back to {@code new BigDecimal(raw).longValue()} — which drops any
 * fraction and WRAPS an out-of-range value to its low 64 bits, never
 * throwing. {@code toString()} returns the raw literal, which is what
 * {@code JsonPrimitive.getAsString} exposes for numbers (the reference's
 * settings values keep their exact source spelling, e.g. "1.500" or
 * "1e3", not a canonical re-rendering).
 */
public final class LazilyParsedNumber extends Number {
    private final String value;

    public LazilyParsedNumber(String value) {
        this.value = value;
    }

    @Override
    public int intValue() {
        try {
            return Integer.parseInt(value);
        } catch (NumberFormatException e) {
            try {
                return (int) Long.parseLong(value);
            } catch (NumberFormatException nfe) {
                return new BigDecimal(value).intValue();
            }
        }
    }

    @Override
    public long longValue() {
        try {
            return Long.parseLong(value);
        } catch (NumberFormatException e) {
            return new BigDecimal(value).longValue();
        }
    }

    @Override
    public float floatValue() {
        return Float.parseFloat(value);
    }

    @Override
    public double doubleValue() {
        return Double.parseDouble(value);
    }

    @Override
    public String toString() {
        return value;
    }
}
